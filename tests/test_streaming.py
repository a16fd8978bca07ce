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
