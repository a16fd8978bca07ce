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
# Round-7 window: with CORRECTNESS_r06 landed, the union checked this
# round is r04 ∪ r06, which displaces every r03-only name at once.
# (a) the 23 r03-only queries — MANDATORY (they would breach the
#     two-record staleness bound otherwise; exact set = r03 − r04 − r06);
# (b) the 4 queries whose r06 row is non-green (oracle HUGEINT/DECIMAL
#     hash artifact, casts fixed this round — VERDICT r06 item 1) —
#     MANDATORY (a red row may not rotate out);
# (c) a20_quantile_sketch — its oracle was edited this round (DECIMAL q
#     → DOUBLE, same hazard class), so it re-earns a green row;
# (d) 22 r04-green names pre-covered for round 8 (the full r04 record
#     falls out of the union when r07 lands; SURVEY §9 budgets them
#     across r7/r8 — the heavy/distinctive families go first).
# New round-7 queries displace group-(d) tail names as they land.
WINDOW = 50

_PRIORITY: list[str] = [
    # (a) r03-only — mandatory re-window
    "a13_corpus_summary", "curate_corpus_neardup", "dedup_embedding_cosine",
    "dedup_embedding_ivf", "dedup_embedding_lsh", "dedup_exact",
    "dedup_exact_stream", "dedup_ngram_jaccard", "m1_update_status",
    "m2_bulk_update_status", "m3_approve_all_pending", "mm_binary_features",
    "mm_decode", "mm_frames", "mm_resize", "q10_prioritize", "q11_sources",
    "q13_effectiveness", "q14_fallback_routing", "q8_faiss_quality",
    "q9_contribution_quality", "ta_fingerprint", "ta_token_count",
    # (b) r06 non-green, oracles recast — mandatory
    "mix_token_budget", "curate_pretrain_pipeline", "shard_manifest",
    "curate_training_mix",
    # (c) oracle/operator edited this round (a20: DECIMAL cast;
    # dedup_fuzzy_*: the short-string brute tier changed BOTH the
    # operator and oracle semantics, so each re-earns a green row)
    # + new round-7 queries (never recorded)
    "a20_quantile_sketch", "dedup_fuzzy_edit", "dedup_fuzzy_groups",
    "emb_pca_audit", "q17_filtered_ann",
    "dedup_source_matrix", "seq_len_histogram", "quality_percentile_gate",
    "ta_boilerplate", "mine_hard_negatives", "a22_hll_daily_merge",
    "m10_read_asof", "emb_quality_report",
    # (c2) late-round-7 queries (never recorded) — each displaced one
    # group-(d) pre-coverage name (all r04-green, so still inside the
    # r04 ∪ r06 union this round)
    "a23_theta_overlap", "mix_temperature", "dedup_normalized",
    "softdedup_weights", "curriculum_order", "split_assign",
    "a24_skew_report", "ta_entropy", "pack_bestfit",
    # (d) r04-green pre-coverage for round 8 (heaviest family kept)
    "q7_fusion",
    # Rotated out this round (all green in r04 or r06, the two records
    # unioned for round 7 — still pytest-parity-checked in-repo every
    # round): the entire r6 window (r06-green: dedup_fuzzy_*, q16_mmr,
    # a19, a20 family, selection/tokenizer tiers, bm25/vocab/contam/
    # asof/range/funnel/retention/pii, q2_ann_*_idx, sketches, zorder,
    # snapshots — a20_quantile_sketch and the dedup_fuzzy_* pair
    # excepted per (c); the rows-only four
    # bpe_train/bpe_encode/q2_ann_ivf_idx/emb_pca_project carry
    # err='no_oracle' rows, which the rotation test accepts as green for
    # oracle-less queries) and the remaining 28 r04-green names
    # (a1–a4/a9–a11/a5_live_users/a6_session_stats/a7_user_activity,
    # m4/m5/m6, q4/q5/q6, rel_pricing/rel_top_parts, s1/s2/s3/s6,
    # t3/t5/t6/t7, u2/u4) plus the TWENTY-ONE group-(d) names round-7
    # work displaced (q3_contribution_search, m7_sessions_from_events,
    # a7_activity_breakdown, rel_revenue_by_nation, ta_lang_id,
    # ta_quality_score, t2_embed, q15_image_search, s8_ingest,
    # s9_upsert_users, rollup_events, knn_self_join, then the late-r7
    # batch: q1_topk_cosine, q2_ann, q2_ann_pq, q2_ann_ivfpq,
    # dedup_groups, curate_corpus, a5_sliding_live_users,
    # a6_session_windows, dedup_minhash_lsh) — those 49 are the round-8
    # window's mandatory core once r07 lands (SURVEY §9), leaving 1 free
    # r8 slot (lean on the documented consolidation folds for more).
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
