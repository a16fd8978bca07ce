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
    # Round-14 window: with CORRECTNESS_r13 landed (committed in 3f6858f),
    # the union checked this round is r12 ∪ r13 (100 distinct names),
    # which displaces the entire r11 record at once. These 50 names are
    # EXACTLY the CORRECTNESS_r11 record — all MANDATORY, zero free slots
    # (the round-13 rotation forcing function listed the same 50; VERDICT
    # r13 item 10 ordered this exact rotation).
    "a10_recent_users", "a11_active_sessions", "a1_doc_summary",
    "a25_kmv_synopsis", "a2_contribution_analytics", "a3_top_rated",
    "a4_recent_qa", "a5_sliding_live_users", "a6_session_stats",
    "a6_session_windows", "a9_pending_count", "curate_corpus",
    "dedup_groups", "dedup_minhash_lsh", "emb_decontaminate",
    "emb_quality_report", "knn_self_join", "m4_terminate_session",
    "m5_gc_sessions", "m6_flip_catalog_status", "m7_sessions_from_events",
    "pack_bestfit_audit", "q15_image_search", "q1_topk_cosine", "q2_ann",
    "q3_contribution_search", "q4_keyword_search", "q5_ilike_pagination",
    "q6_session_search", "rel_bloom_semijoin", "rel_pricing_summary",
    "rel_revenue_by_nation", "rel_top_parts_by_brand", "rollup_events",
    "s1_scan", "s2_extract_join", "s3_extract_pages", "s6_upload_catalog",
    "s8_ingest", "s9_upsert_users", "t2_embed", "t3_normalize", "t5_preview",
    "t6_validate", "t7_sanitize", "ta_lang_id", "ta_quality_score",
    "tok_fertility_report", "u2_nokey_answer", "u4_image_answer",
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
