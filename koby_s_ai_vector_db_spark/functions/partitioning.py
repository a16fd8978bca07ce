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

# The ``df.rdd.getNumPartitions()`` probe costs ~45 ms of driver work per
# call (it plans the RDD lineage through py4j), and the registry rebuilds
# the same spread() inputs on every query construction — ~0.1 s of every
# bench-loop call for two probes (round-13 profile, guide §1). The width
# of a plan is a pure function of (application, canonicalized logical
# plan): file listings are memoized per application (sources/tables.py)
# and session confs that shape splits don't change mid-application — so
# the probe result is memoized on the JVM plan's semanticHash.
_WIDTH_MEMO: dict[tuple, int] = {}


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition up to the session's default parallelism when
    the input arrives narrower. One cheap shuffle of the raw rows buys
    machine-wide codegen maps downstream."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    key = (sc.applicationId, df._jdf.semanticHash())
    width = _WIDTH_MEMO.get(key)
    if width is None:
        width = df.rdd.getNumPartitions()
        _WIDTH_MEMO[key] = width
    return df.repartition(target) if width < target else df
