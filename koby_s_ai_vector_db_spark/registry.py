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


# Driver correctness tooling checks the FIRST 50 registry entries each
# round. Names listed here surface to the front of queries() in this order
# (then everything else in registration order), so the per-round
# verification window is chosen explicitly instead of by module import
# order. Round-4 window: (a) queries with no driver row since round 2 or
# never (m6/s9/t2/s8/u2/t5-t7, analytics, lexical, rel_*), (b) everything
# reading `events` — its fixture schema changed to native TIMESTAMP(µs)
# this round, (c) operators changed this round (PQ tiers), (d) flagships.
_PRIORITY: list[str] = [
    # (a) stale or never driver-checked
    "m6_flip_catalog_status", "s9_upsert_users", "t2_embed", "s8_ingest",
    "u2_nokey_answer", "t5_preview", "t6_validate", "t7_sanitize",
    "a1_doc_summary", "a2_contribution_analytics", "a3_top_rated",
    "a4_recent_qa", "a5_live_users", "a6_session_stats",
    "a7_activity_breakdown", "a7_user_activity", "a9_pending_count",
    "a10_recent_users", "a11_active_sessions", "q3_contribution_search",
    "q4_keyword_search", "q5_ilike_pagination", "q6_session_search",
    "rel_pricing_summary", "rel_revenue_by_nation", "rel_top_parts_by_brand",
    # (b) events schema change
    "a5_sliding_live_users", "a6_session_windows", "rollup_events",
    "m4_terminate_session", "m5_gc_sessions", "m7_sessions_from_events",
    # (c) changed this round
    "q2_ann_pq", "q2_ann_ivfpq",
    # (d) flagships (remaining window)
    "q1_topk_cosine", "q2_ann", "knn_self_join", "t3_normalize",
    "dedup_minhash_lsh", "dedup_groups", "curate_corpus", "q7_fusion",
]


def _ordered() -> dict[str, tuple[SparkQuery, str | None]]:
    front = {n: _REGISTRY[n] for n in _PRIORITY if n in _REGISTRY}
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
