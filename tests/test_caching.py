"""memo_persist contract: one persisted copy per (session, key)."""

from __future__ import annotations

import pyspark.sql.functions as F

from koby_s_ai_vector_db_spark.functions import caching


def test_memo_persist_builds_once_and_reuses(spark):
    calls = []

    def build():
        calls.append(1)
        return spark.range(10).withColumn("x", F.col("id") * 2)

    a = caching.memo_persist(spark, ("t", "k1"), build)
    b = caching.memo_persist(spark, ("t", "k1"), build)
    assert a is b and len(calls) == 1
    assert a.storageLevel.useMemory  # persisted
    c = caching.memo_persist(spark, ("t", "k2"), build)
    assert c is not a and len(calls) == 2
    assert a.count() == 10

    caching.evict_application(spark)
    d = caching.memo_persist(spark, ("t", "k1"), build)
    assert d is not a and len(calls) == 3  # rebuilt after eviction
    caching.evict_application(spark)
