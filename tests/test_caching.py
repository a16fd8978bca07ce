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


def test_repeated_query_calls_do_not_accumulate_cache_entries(spark):
    """Round-12 leak-class guard: a registered query called repeatedly
    (bench passes, fused pipelines) must not register NEW cache entries
    per call. dedup_incremental used persist_uncached on the new batch's
    grams — every call created a fresh .persist() nothing released, and
    abandoned copies accumulated until memory pressure (standalone sf1
    passes read [55.8, 44.7, 11.2] s). Both of its sides memoize now;
    this pins the invariant for the query AND the memo dict itself."""
    from koby_s_ai_vector_db_spark import registry
    from koby_s_ai_vector_db_spark.functions import caching
    from tests.conftest import SF_DIRS

    sf_dir = SF_DIRS["t1"]
    fn = registry.queries()["dedup_incremental"]
    jsc = spark.sparkContext._jsc.sc()

    fn(spark, sf_dir).count()  # builds + registers the memos
    n_memo_before = len(caching._CACHE)
    n_rdds_before = jsc.getPersistentRDDs().size()
    for _ in range(3):
        fn(spark, sf_dir).count()
    assert len(caching._CACHE) == n_memo_before
    # One-sided: GROWTH is the leak signal. In a full-suite run the JVM's
    # ContextCleaner asynchronously unpersists RDDs abandoned by EARLIER
    # tests, so the absolute count can legitimately SHRINK mid-test — an
    # equality assert flakes on that (round-13 full-suite run).
    assert jsc.getPersistentRDDs().size() <= n_rdds_before
