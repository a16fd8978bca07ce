"""Partition-width control for CPU-bound map stages.

The driver fixtures are single-row-group parquet files, so a scan arrives
1–3 partitions wide; any expensive per-row map rooted at it (md5-based
signatures, dot products over embedding arrays, rolling fingerprints)
would then run effectively single-threaded on a 32-core machine. `spread`
is applied INSIDE the operators whose maps are worth a shuffle — never at
load time, where it would tax every cheap query and multiply pandas_udf
worker spawn-ups. On a real cluster the split count dwarfs the core count
and `spread` becomes a no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition up to the session's default parallelism when
    the input arrives narrower. One cheap shuffle of the raw rows buys
    machine-wide codegen maps downstream."""
    target = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(target) if df.rdd.getNumPartitions() < target else df
