"""As-of join query: enrich each event with the customer's latest price
update known at event time.

The "updates" stream is derived deterministically from `orders` (the raw
o_orderdate range 1995-2001 predates the 2024 event window, which would
make a time-join degenerate): update time = 2024-01-01 + (o_orderkey mod
720) hours, spreading updates across the event month so events genuinely
interleave with updates — early events have no prior update and drop out
of the inner as-of. Ties per (customer, hour) are deduped to the max
order key (max_by total price) on BOTH engines, making the as-of pick
unique. The oracle is DuckDB's native ASOF JOIN — an independent
implementation of the same semantics, so parity checks the operator's
union-window mechanics, not a transliteration of them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from koby_s_ai_vector_db_spark.operators.asof import asof_join
from koby_s_ai_vector_db_spark.registry import register
from koby_s_ai_vector_db_spark.sources.tables import load_table

_UPD_HOURS_MOD = 720  # 30 days of hourly slots


def _updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, upd_ts, o_orderkey, o_totalprice), unique per
    (user_id, upd_ts)."""
    orders = load_table(spark, sf_dir, "orders")
    upd = orders.select(
        F.col("o_custkey").alias("user_id"),
        F.expr(
            "CAST('2024-01-01 00:00:00' AS TIMESTAMP_NTZ) + "
            f"make_interval(0, 0, 0, 0, CAST(o_orderkey % {_UPD_HOURS_MOD} AS INT), 0, 0)"
        ).alias("upd_ts"),
        "o_orderkey",
        "o_totalprice",
    )
    return upd.groupBy("user_id", "upd_ts").agg(
        F.max("o_orderkey").alias("o_orderkey"),
        F.max_by("o_totalprice", "o_orderkey").alias("o_totalprice"),
    )


_ASOF_ORACLE = f"""
WITH upd AS (
    SELECT o_custkey AS user_id,
           TIMESTAMP '2024-01-01 00:00:00'
               + (o_orderkey % {_UPD_HOURS_MOD}) * INTERVAL 1 HOUR AS upd_ts,
           o_orderkey, o_totalprice
    FROM orders
),
upd_d AS (
    SELECT user_id, upd_ts, max(o_orderkey) AS o_orderkey,
           arg_max(o_totalprice, o_orderkey) AS o_totalprice
    FROM upd GROUP BY user_id, upd_ts
)
SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
       u.o_orderkey, u.o_totalprice
FROM events e ASOF JOIN upd_d u
    ON e.user_id = u.user_id AND e.ts >= u.upd_ts
"""


@register("asof_enrich_events", _ASOF_ORACLE)
def asof_enrich_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment (operators/asof.py): one union + one
    keyed window — a single shuffle on user_id, linear rows, vs the
    quadratic pair-explosion of a range-join-then-max. Oracle: DuckDB's
    native ASOF JOIN."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    out = asof_join(
        ev,
        _updates(spark, sf_dir),
        on=["user_id"],
        left_ts="ts",
        right_ts="upd_ts",
        how="inner",
        assume_deduped=True,  # deduped by construction above
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "o_orderkey",
        "o_totalprice",
    )
