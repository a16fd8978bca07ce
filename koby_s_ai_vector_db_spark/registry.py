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
# Round-8 window: with CORRECTNESS_r07 landed, the union checked this
# round is r06 ∪ r07 (95 distinct names), which displaces the entire
# r04 record at once. The 49 names below are exactly
# (registered − r06 − r07), i.e. every query whose last external check
# was r04 — all MANDATORY, minus the three consolidation folds executed
# this round (SURVEY §9 candidates, noted in §8):
#   - a7_activity_breakdown → folded into the a7 family (function +
#     pytest parity retained; unregistered);
#   - q8_faiss_quality / q9_contribution_quality → strict projections of
#     q7_fusion, which hash-checks both quality columns (unregistered);
#   - q2_ann_pq / q2_ann_ivfpq inline tiers → the persisted
#     q2_ann_pq_idx / q2_ann_ivfpq_idx twins share the SAME oracles and
#     are the documented production path (unregistered).
# q8/q9 were r07-green so their fold frees no r8 slot; the other three
# were in the mandatory set, leaving 46 mandatory + 4 free slots for
# round-8 work (each new/edited-oracle query appended below as it lands).
WINDOW = 50

_PRIORITY: list[str] = [
    # Mandatory: last externally checked in r04 (displaced when r07 landed)
    "a1_doc_summary", "a2_contribution_analytics", "a3_top_rated",
    "a4_recent_qa", "a5_live_users", "a5_sliding_live_users",
    "a6_session_stats", "a6_session_windows", "a7_user_activity",
    "a9_pending_count", "a10_recent_users", "a11_active_sessions",
    "curate_corpus", "dedup_groups", "dedup_minhash_lsh", "knn_self_join",
    "m4_terminate_session", "m5_gc_sessions", "m6_flip_catalog_status",
    "m7_sessions_from_events", "q1_topk_cosine", "q2_ann",
    "q3_contribution_search", "q4_keyword_search", "q5_ilike_pagination",
    "q6_session_search", "q15_image_search", "rel_pricing_summary",
    "rel_revenue_by_nation", "rel_top_parts_by_brand", "rollup_events",
    "s1_scan", "s2_extract_join", "s3_extract_pages", "s6_upload_catalog",
    "s8_ingest", "s9_upsert_users", "t2_embed", "t3_normalize",
    "t5_preview", "t6_validate", "t7_sanitize", "ta_lang_id",
    "ta_quality_score", "u2_nokey_answer", "u4_image_answer",
    # Round-8 slots (new queries / edited-oracle re-earns land here)
    # emb_quality_report: r07-green, but its oracle was edited this round
    # (quantization order fix, ADVICE r07) — edited oracle re-earns.
    "emb_quality_report",
    # pack_bestfit_audit: NEW — the hash-checked audit arm for the
    # rows-only BFD packing (VERDICT r07 item 3).
    "pack_bestfit_audit",
    # emb_decontaminate: NEW — embedding-space eval-leakage check
    # (VERDICT r07 item 5).
    "emb_decontaminate",
    # a25_kmv_synopsis: NEW — batch twin of the streaming KMV synopsis
    # (VERDICT r07 item 4); stream ≡ batch proven in tests.
    "a25_kmv_synopsis",
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
