"""Hot-key mitigation for holistic aggregations: two-phase salted collect.

Where skew is already handled for free, we rely on the engine:

  - algebraic aggregates (sum/count/avg/min/max): partial map-side combine
    collapses every mapper's rows to one row per key before the shuffle,
    so a hot key costs nothing extra (session.py enables AQE coalesce on
    top);
  - skewed sort-merge joins: AQE skew-join splits oversized partitions at
    runtime (spark.sql.adaptive.skewJoin.enabled, session.py:33).

What neither fixes is a HOLISTIC aggregate on a skewed key —
`collect_list`/`array_sort` context assembly (operators/fusion.py Q12),
per-key top-N, distinct-set building: every row of the hot key must reach
one reducer task, and partial aggregation only wraps them into arrays on
the way. At 100 TB one viral query_id / session_id / shingle bucket means
one straggler task holding the whole stage.

`two_phase_collect` restores balance by salting: rows scatter over
`n_salt` sub-keys (deterministic hash of a row column — reproducible, no
rand()), each sub-group pre-aggregates its slice, and a second small
aggregate merges `n_salt` arrays per key. The hot key's work spreads over
n_salt tasks; the merge handles arrays, not rows. Results are identical
because the final `array_sort` imposes the total order the direct form
pins with its own sort key (FIXTURES.md determinism contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def two_phase_collect(
    df: DataFrame,
    key_cols: list[str],
    payload: str,
    out_col: str = "items",
    n_salt: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Per-key sorted array of `payload` (a struct/atomic column name),
    built skew-safe in two phases:

      phase 1: groupBy(key, salt) -> collect_list(payload)   [n_salt tasks
               share a hot key's rows]
      phase 2: groupBy(key) -> array_sort(flatten(collect_list(arrays)))

    `salt_on` names a column whose hash spreads rows (defaults to the
    payload itself); deterministic, so retries/speculative tasks agree.
    Equivalent to groupBy(key).agg(array_sort(collect_list(payload))) —
    asserted by tests/test_skew.py — but the direct form funnels every row
    of a hot key through one task."""
    salt_src = salt_on if salt_on is not None else payload
    salt = F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salt)).alias("_salt")
    partial = (
        df.groupBy(*key_cols, salt)
        .agg(F.collect_list(payload).alias("_part"))
    )
    return (
        partial.groupBy(*key_cols)
        .agg(F.array_sort(F.flatten(F.collect_list("_part"))).alias(out_col))
    )
