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
# Window history: the round-11 window was the 48 r08-displaced names
# plus the two pre-earned prebuilds (tok_fertility_report,
# rel_bloom_semijoin); CORRECTNESS_r11 recorded all 50 green. The
# current (round-12) window is documented on _PRIORITY below.
WINDOW = 50

_PRIORITY: list[str] = [
    # Round-13 window: with CORRECTNESS_r12 landed (committed in bfab8e2),
    # the union checked this round is r11 ∪ r12 (100 distinct names),
    # which displaces the entire r10 record at once. These 50 names are
    # EXACTLY the CORRECTNESS_r10 record — all MANDATORY, zero free slots
    # (SURVEY §9 enumerated them in advance; the round-12 rotation-test
    # failure message listed the same 50).
    "a13_corpus_summary", "a20_quantile_sketch", "a22_hll_daily_merge",
    "a23_theta_overlap", "a24_skew_report", "curate_corpus_neardup",
    "curate_pretrain_pipeline", "curate_training_mix", "curriculum_order",
    "dedup_embedding_cosine", "dedup_embedding_ivf", "dedup_embedding_lsh",
    "dedup_exact", "dedup_exact_stream", "dedup_fuzzy_edit",
    "dedup_fuzzy_groups", "dedup_ngram_jaccard", "dedup_normalized",
    "dedup_source_matrix", "emb_pca_audit", "graph_pagerank", "m10_read_asof",
    "m1_update_status", "m2_bulk_update_status", "m3_approve_all_pending",
    "mine_hard_negatives", "mix_temperature", "mix_token_budget",
    "mm_binary_features", "mm_decode", "mm_frames", "mm_resize",
    "pack_bestfit", "q10_prioritize", "q11_sources", "q14_fallback_routing",
    "q17_filtered_ann", "q18_ann_recall", "q7_fusion",
    "quality_percentile_gate", "rel_returned_revenue", "seq_len_histogram",
    "shard_manifest", "softdedup_weights", "split_assign", "ta_boilerplate",
    "ta_entropy", "ta_fingerprint", "ta_pmi_collocations", "ta_token_count",
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
