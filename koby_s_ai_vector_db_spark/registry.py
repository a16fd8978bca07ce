"""Query registry: the SURVEY.md §2 operator inventory as named queries.

Each entry is (spark_fn, oracle_sql | None):
  spark_fn(spark, sf_dir) -> DataFrame      — the engine under test
  oracle_sql                                — equivalent DuckDB ANSI SQL over
                                              the fixture views, or None for
                                              non-SQL-expressible operators
                                              (driver then does rows-only).

Column names are aliased identically on both sides — the driver sorts
columns by name before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, tuple[SparkQuery, str | None]] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: SparkQuery) -> SparkQuery:
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


# Driver correctness tooling checks the FIRST `WINDOW` registry entries
# each round. Names listed here surface to the front of queries() in this
# order (then everything else in registration order), so the per-round
# verification window is chosen explicitly instead of by module import
# order.
#
# Rotation invariant (enforced by tests/test_registry_rotation.py against
# the committed CORRECTNESS_r*.json records): every registered query must
# be either IN this window or present-and-green in one of the LAST TWO
# committed driver records — bounded staleness of two recorded rounds.
#
# CADENCE NOTE (round 6): the invariant was a strict one-record bound
# through round 5. The round-5 driver record never landed (no
# CORRECTNESS_r05.json was committed), which makes the one-record bound
# unsatisfiable at 100 queries — the newest record (r04) holds 50 rows
# and the other 50 queries cannot all fit one 50-slot window. The test
# now unions the last two committed records; the bound degrades from
# "≤1 recorded round stale" to "≤2 recorded rounds stale", which also
# lifts capacity to 150 queries (documented in SURVEY §8).
#
# Round-10 window: with CORRECTNESS_r09 landed (committed in bb7f3a3),
# the union checked this round is r08 ∪ r09 (100 distinct names), which
# displaces the entire r07 record at once. The 47 names below are
# exactly (registered − r08 − r09), i.e. every query whose last external
# check was r07 — all MANDATORY (SURVEY §9 enumerated them in advance;
# the round-9 rotation-test failure message listed the same 47).
# The remaining 3 slots are the pre-earned round-10 trio (implemented +
# DuckDB-oracled + plan-pinned + sf1-probed in late round 8,
# registration deferred until these slots opened).
WINDOW = 50

_PRIORITY: list[str] = [
    # Mandatory: last externally checked in r07 (displaced when r09 landed)
    "a13_corpus_summary", "a20_quantile_sketch", "a22_hll_daily_merge",
    "a23_theta_overlap", "a24_skew_report", "curate_corpus_neardup",
    "curate_pretrain_pipeline", "curate_training_mix", "curriculum_order",
    "dedup_embedding_cosine", "dedup_embedding_ivf", "dedup_embedding_lsh",
    "dedup_exact", "dedup_exact_stream", "dedup_fuzzy_edit",
    "dedup_fuzzy_groups", "dedup_ngram_jaccard", "dedup_normalized",
    "dedup_source_matrix", "emb_pca_audit", "m10_read_asof",
    "m1_update_status", "m2_bulk_update_status", "m3_approve_all_pending",
    "mine_hard_negatives", "mix_temperature", "mix_token_budget",
    "mm_binary_features", "mm_decode", "mm_frames", "mm_resize",
    "pack_bestfit", "q10_prioritize", "q11_sources",
    "q14_fallback_routing", "q17_filtered_ann", "q7_fusion",
    "quality_percentile_gate", "seq_len_histogram", "shard_manifest",
    "softdedup_weights", "split_assign", "ta_boilerplate", "ta_entropy",
    "ta_fingerprint", "ta_token_count",
    # Round-10 free slots: the pre-earned trio (SURVEY §9; parity rows
    # lived in tests/test_prebuilt_r9.py until registration —
    # test_oracle_parity auto-covers them now).
    "graph_pagerank",
    "ta_pmi_collocations",
    "q18_ann_recall",
    # Late round 10: fold ladder step 4 (q13_effectiveness → q7_fusion's
    # query_length/search_effectiveness/recommendation columns) freed a
    # window slot mid-round; it takes the already-verified round-11
    # prebuild rel_returned_revenue (TPC-H Q10 shape), de-risking r11.
    "rel_returned_revenue",
]


def _ordered() -> dict[str, tuple[SparkQuery, str | None]]:
    unknown = [n for n in _PRIORITY if n not in _REGISTRY]
    if unknown:
        # Loud, not silent: a typo or a renamed query would otherwise
        # quietly change which queries land in the externally-checked
        # first-WINDOW verification slice.
        raise KeyError(
            f"registry._PRIORITY names not registered: {unknown} "
            f"(registered: {sorted(_REGISTRY)})"
        )
    front = {n: _REGISTRY[n] for n in _PRIORITY}
    rest = {n: v for n, v in _REGISTRY.items() if n not in front}
    return {**front, **rest}


def queries() -> dict[str, SparkQuery]:
    _load_all()
    return {name: fn for name, (fn, _) in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {
        name: sql for name, (_, sql) in _ordered().items() if sql is not None
    }


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (side-effect imports)."""
    global _LOADED
    if _LOADED:
        return
    from koby_s_ai_vector_db_spark import queries as _q  # noqa: F401

    _LOADED = True
