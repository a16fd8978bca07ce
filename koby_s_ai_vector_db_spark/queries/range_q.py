"""Range-join query: assign every event to its containing session window.

The intervals are the a6 session windows (30-min inactivity sessionization,
streaming/live.py) — non-overlapping per user, so each event lands in
exactly one window and the output row count equals the event count, which
makes containment-correctness externally checkable. The oracle expresses
the same thing as a plain BETWEEN join over the shared session CTE: the
bucketed equi-join rewrite (operators/rangejoin.py) must be
indistinguishable from the naive range join, row for row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from koby_s_ai_vector_db_spark.operators.rangejoin import range_join
from koby_s_ai_vector_db_spark.queries.streaming_q import SESSION_WINDOWS_CTE
from koby_s_ai_vector_db_spark.registry import register
from koby_s_ai_vector_db_spark.sources.tables import load_table
from koby_s_ai_vector_db_spark.streaming.live import user_session_windows

# 6 h in µs: sessions are gap-1800s windows, typically minutes-to-hours —
# ~2× amplification on the build side, most co-bucketed pairs genuine.
_BUCKET_US = 6 * 3600 * 1_000_000

_RANGE_ORACLE = SESSION_WINDOWS_CTE + """
SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
       sess.session_start_us, sess.session_end_us
FROM events e JOIN sess
  ON e.user_id = sess.user_id
 AND epoch_us(e.ts) >= sess.session_start_us
 AND epoch_us(e.ts) < sess.session_end_us
"""


@register("range_session_assign", _RANGE_ORACLE)
def range_session_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join via interval bucketing (operators/
    rangejoin.py): intervals explode to covered 6h buckets, events tag
    theirs, the join is a plain equi-join on (user_id, bucket) with the
    exact containment check residual on co-bucketed pairs only — work per
    hot user is bounded by bucket occupancy, not |events|·|sessions|."""
    ev = load_table(spark, sf_dir, "events")
    events = ev.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    sessions = user_session_windows(ev).drop("n_events")
    return range_join(
        events,
        sessions,
        on=["user_id"],
        point_col="ts_us",
        start_col="session_start_us",
        end_col="session_end_us",
        bucket_width=_BUCKET_US,
    )
