"""Batch-equivalence: the streaming pipelines must produce exactly the
rows their batch twins produce (SURVEY §7.6). Finite fixture → one
availableNow pass → complete-mode memory sink → compare multisets."""

from __future__ import annotations

import uuid

from koby_s_ai_vector_db_spark.sources.tables import load_table
from koby_s_ai_vector_db_spark.streaming.live import (
    read_events_stream,
    sliding_live_users,
    user_session_windows,
)
from tests.conftest import SF_DIRS

SF_DIR = SF_DIRS["t1"]


def _run_stream(spark, df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_sliding_live_users_stream_equals_batch(spark):
    batch = sliding_live_users(load_table(spark, SF_DIR, "events"))
    name = f"s_live_{uuid.uuid4().hex[:8]}"
    stream = _run_stream(spark, sliding_live_users(read_events_stream(spark, SF_DIR)), name)
    assert _rows(stream) == _rows(batch)
    assert len(_rows(batch)) > 0


def test_session_windows_stream_equals_batch(spark):
    batch = user_session_windows(load_table(spark, SF_DIR, "events"))
    name = f"s_sess_{uuid.uuid4().hex[:8]}"
    stream = _run_stream(
        spark, user_session_windows(read_events_stream(spark, SF_DIR)), name
    )
    assert _rows(stream) == _rows(batch)
    assert len(_rows(batch)) > 0


def test_stateful_user_stats_across_batches(spark, tmp_path):
    """applyInPandasWithState carries per-user state across microbatches:
    the fixture is split into two files, maxFilesPerTrigger=1 forces (at
    least) two batches, and the LAST update emitted per user must equal
    the batch aggregate over the whole fixture."""
    from pyspark.sql import functions as F

    from koby_s_ai_vector_db_spark.streaming.live import (
        EVENTS_SCHEMA,
        stateful_user_stats,
    )

    ev = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "events_split")
    raw = spark.read.parquet(f"{SF_DIR}/events.parquet")  # keep raw int96/nanos ts
    raw.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(f"{src}/half=0")
    raw.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(f"{src}/half=1")

    stream_in = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .load(src)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    name = f"s_state_{uuid.uuid4().hex[:8]}"
    q = (
        stateful_user_stats(stream_in)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 2, "state was never exercised across batches"

    # Latest update per user (n_events is monotone within a user).
    updates = spark.sql(f"SELECT * FROM {name}")
    w_latest = updates.groupBy("user_id").agg(
        F.max_by(
            F.struct("n_events", "n_purchases", "n_errors", "last_seen_us"), "n_events"
        ).alias("s")
    ).select("user_id", "s.*")

    batch = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.count_if(F.col("event_type") == "purchase").alias("n_purchases"),
        F.count_if(F.col("event_type") == "error").alias("n_errors"),
        F.max(F.unix_micros("ts")).alias("last_seen_us"),
    )
    assert _rows(w_latest) == _rows(batch)
    assert len(_rows(batch)) > 0
