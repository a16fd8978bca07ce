"""Global top-N that scales: TakeOrderedAndProject, not a global window.

Spark's WindowGroupLimit optimization pre-truncates `row_number() <= k`
filters per task — but ONLY for windows with a partition spec. An
un-partitioned (global) window funnels every row through a single task
regardless of the rank filter (verified on Spark 4.1: neither `<= k` nor
BETWEEN triggers the rewrite without partition columns).

The scale-safe global pattern is therefore `orderBy(...).limit(n)` —
Catalyst compiles it to TakeOrderedAndProject (per-partition top-n heap +
single small merge) — followed, when a rank column is needed, by a
row_number window over the ALREADY-BOUNDED n rows (single partition of at
most n rows, harmless at any corpus size).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_top_n(df: DataFrame, order: list[Column], n: int, rank_col: str | None = None) -> DataFrame:
    """Top-n of df under `order` (must be a deterministic total order —
    include an id tiebreak). With rank_col, attaches row_number 1..n
    computed over the bounded result."""
    top = df.orderBy(*order).limit(n)
    if rank_col is not None:
        top = top.withColumn(rank_col, F.row_number().over(Window.orderBy(*order)))
    return top
