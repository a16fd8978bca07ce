"""Streaming temporal (as-of) enrichment — the batch asof_join
(operators/asof.py) as a continuously-maintained stateful operator.

Flink calls this a temporal table join; kdb+ ticks call it a live aj:
an event stream is enriched with "the latest value of X known for this
key at event time", where X (a price, a feature, a profile field) is
itself a stream of updates. Spark has no two-stream as-of join, so the
standard shape is:

  1. UNION the two streams into one tagged stream that shares
     (key, ts) — updates carry the payload, events carry their ids;
  2. group by key and run `applyInPandasWithState`: the state is the
     latest (payload, ts) seen for the key; each microbatch's rows are
     processed in (ts, updates-first) order, updates advance the state,
     events emit enriched rows from it.

Equivalence contract: when the stream's files are TIME-PARTITIONED
(every batch's rows are newer than the previous batch's — the normal
shape of an append log), the emitted rows equal the batch
``asof_join(events, updates, how="left")`` exactly; the cross-batch case
is proven in tests/test_streaming.py. With out-of-order arrival ACROSS
microbatches the operator is the standard streaming approximation: an
event processed before a late update sees the older state (Flink's
processing-time temporal join makes the same trade; its event-time
variant buffers on watermarks — here that buffering tier is the batch
asof_join over the closed window).

State per key is one payload + one timestamp — bounded by key
cardinality, evictable via GroupStateTimeout once a production stream
sets a watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NO_MATCH = -1.0  # sentinel payload for events before any update (null-free)


def tag_streams(
    events: DataFrame,
    updates: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    id_col: str = "event_id",
    payload_col: str = "price",
) -> DataFrame:
    """Union-tag the two inputs into the single grouped stream the
    stateful operator consumes. Works identically on batch and streaming
    DataFrames (the batch-equivalence contract of streaming/live.py)."""
    ev = events.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(0).alias("is_update"),
        F.col(id_col),
        F.lit(None).cast("double").alias(payload_col),
    )
    up = updates.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(1).alias("is_update"),
        F.lit(None).cast("long").alias(id_col),
        F.col(payload_col).cast("double"),
    )
    return ev.unionByName(up)


def stateful_asof_enrich(
    tagged: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    id_col: str = "event_id",
    payload_col: str = "price",
) -> DataFrame:
    """Enrich each event row with the latest update payload at or before
    its timestamp, carrying the latest (payload, ts) per key in explicit
    group state across microbatches. Emits one row per EVENT (append
    mode); update rows only advance state. Arrow-batched like every
    Python hop in this repo."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        f"{id_col} bigint, {key_col} bigint, {ts_col} bigint, "
        f"{payload_col} double, matched_ts bigint"
    )
    state_schema = "latest double, latest_ts bigint"

    def update_fn(key, pdfs, state: GroupState):
        import pandas as pd

        latest, latest_ts = state.get if state.exists else (None, None)
        out = []
        for pdf in pdfs:
            # ts order, updates before events at equal ts — the batch
            # operator's inclusive-as-of tie rule.
            pdf = pdf.sort_values([ts_col, "is_update"], ascending=[True, False])
            for row in pdf.itertuples(index=False):
                if getattr(row, "is_update") == 1:
                    latest = float(getattr(row, payload_col))
                    latest_ts = int(getattr(row, ts_col))
                else:
                    out.append(
                        (
                            int(getattr(row, id_col)),
                            key[0],
                            int(getattr(row, ts_col)),
                            latest if latest is not None else NO_MATCH,
                            latest_ts if latest_ts is not None else -1,
                        )
                    )
        if latest is not None:
            state.update((latest, latest_ts))
        yield pd.DataFrame(
            out, columns=[id_col, key_col, ts_col, payload_col, "matched_ts"]
        )

    return tagged.groupBy(key_col).applyInPandasWithState(
        update_fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
