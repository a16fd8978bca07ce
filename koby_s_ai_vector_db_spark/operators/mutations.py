"""Mutation / state-transition operators (SURVEY §2.5 M1–M7) as batch
rewrites.

The reference mutates rows in place (Postgres UPDATE/DELETE,
supabase_utils.py:368-406, views.py:1162-1821, session_utils.py:248-269).
In a lakehouse the idiomatic equivalents are MERGE-style conditional
rewrites: a keyed `when(...)` overwrite for updates, an anti-filter for
deletes, and `row_number() over (partition by key order by ts desc) = 1`
for upserts. All are expressed here as pure DataFrame→DataFrame functions
(the write side is a plain `df.write.mode("overwrite")` / format-specific
MERGE and is exercised in tests via parquet round-trips).

Each is a narrow map-only transform (no shuffle except the upsert's
window) — at 100 TB you'd pair them with partition pruning on the key
columns so the rewrite touches only affected partitions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from koby_s_ai_vector_db_spark.sources.tables import NOW_TS

def _now():
    """Pinned `now` Column — lazy because literal Columns need a live
    SparkContext (import-time eval breaks pytest collection)."""
    return F.to_timestamp(F.lit(NOW_TS))


def update_status(feedback: DataFrame, contribution_id: int, action: str) -> DataFrame:
    """M1 (supabase_utils.py:400-406): single-row status flip."""
    new_status = F.lit("approved" if action == "approve" else "rejected")
    return feedback.withColumn(
        "status",
        F.when(F.col("id") == contribution_id, new_status).otherwise(F.col("status")),
    )


def bulk_update_status(feedback: DataFrame, ids: Sequence[int], action: str) -> DataFrame:
    """M2 (views.py:1162-1202): the reference loops single UPDATEs; here one
    conditional rewrite with `id IN (...)` — one pass regardless of |ids|."""
    new_status = F.lit("approved" if action == "approve" else "rejected")
    return feedback.withColumn(
        "status",
        F.when(F.col("id").isin(list(ids)), new_status).otherwise(F.col("status")),
    )


def approve_all_pending(feedback: DataFrame) -> DataFrame:
    """M3 (supabase_utils.py:368-380): pending → approved, everything else
    untouched."""
    return feedback.withColumn(
        "status",
        F.when(F.col("status") == "pending", F.lit("approved")).otherwise(F.col("status")),
    )


def sessions_from_events(events: DataFrame) -> DataFrame:
    """Derive the reference's user_sessions shape (session_models.py:4-30)
    from the events log: one row per user with login/last-activity times and
    the 30-minute liveness rule (session_utils.py:200)."""
    lo30 = _now() - F.expr("INTERVAL 30 MINUTES")
    return (
        events.filter(F.col("ts") <= _now())
        .groupBy("user_id")
        .agg(F.min("ts").alias("login_time"), F.max("ts").alias("last_activity"))
        .withColumn(
            "is_active",
            F.when(F.col("last_activity") >= lo30, F.lit("active")).otherwise(
                F.lit("inactive")
            ),
        )
        .withColumn(
            # NULL for "no logout yet" — the reference's semantics
            # (session_models.py logout_time null=True): consumers computing
            # session age or max(logout_time) must see NULL, not a magic
            # epoch. Registered queries that feed the driver's multiset
            # compare substitute a sentinel AT THE ORACLE EDGE ONLY
            # (queries/mutations_q.py::_sessions_for_oracle) because NaT
            # cells pair nondeterministically in a sorted-tuple compare.
            "logout_time",
            F.when(F.col("is_active") == "inactive", F.col("last_activity")),
        )
    )


def terminate_session(sessions: DataFrame, user_id: int) -> DataFrame:
    """M4 (views.py:1775-1821): keyed terminate — set inactive + logout=now."""
    hit = F.col("user_id") == user_id
    return sessions.withColumn(
        "logout_time", F.when(hit, _now()).otherwise(F.col("logout_time"))
    ).withColumn(
        "is_active", F.when(hit, F.lit("inactive")).otherwise(F.col("is_active"))
    )


def gc_sessions(sessions: DataFrame, hours: int = 24) -> DataFrame:
    """M5 (session_utils.py:248-269): DELETE inactive sessions whose logout
    is older than the horizon — expressed as the surviving anti-filter."""
    horizon = _now() - F.expr(f"INTERVAL {hours} HOURS")
    doomed = (F.col("is_active") == "inactive") & (F.col("logout_time") < horizon)
    return sessions.filter(~doomed)


def flip_catalog_status(documents: DataFrame, chunks: DataFrame) -> DataFrame:
    """M6 (supabase_utils.py:244-246): after ingest, documents flip to
    status='indexed' with chunk_count + indexed_at. Aggregate-then-join so
    the join input is one row per doc."""
    counts = chunks.groupBy("doc_id").agg(F.count("*").alias("chunk_count"))
    return (
        documents.join(counts, "doc_id", "left")
        .withColumn("chunk_count", F.coalesce("chunk_count", F.lit(0)))
        .withColumn(
            "status",
            F.when(F.col("chunk_count") > 0, F.lit("indexed")).otherwise(F.lit("uploaded")),
        )
        .withColumn("indexed_at", F.when(F.col("status") == "indexed", _now()))
    )


def catalog_insert(catalog: DataFrame, new_rows: DataFrame) -> DataFrame:
    """S6 (supabase_utils.py:150-176): blob upload + `documents` INSERT
    with status='uploaded'. The blob write is a plain binary file/object
    write; the catalog side is an append — expressed as a union so the
    result is checkable. Existing rows keep their status; new rows enter
    as 'uploaded' awaiting S8 ingest (which flips them via M6)."""
    return catalog.unionByName(new_rows.withColumn("status", F.lit("uploaded")))


def upsert_users(existing: DataFrame, updates: DataFrame, key: str = "user_id") -> DataFrame:
    """S9's upsert (supabase_utils.py:63-88, on_conflict=django_user_id):
    union + keep-latest-per-key. At scale: MERGE INTO on a keyed table.

    Ties on updated_at resolve to the `updates` side (MERGE "WHEN MATCHED
    THEN UPDATE" semantics) — a deterministic secondary sort key per the
    FIXTURES.md determinism contract."""
    w = Window.partitionBy(key).orderBy(F.desc("updated_at"), F.desc("_src"))
    return (
        existing.withColumn("_src", F.lit(0))
        .unionByName(updates.withColumn("_src", F.lit(1)))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )
