"""Scale mechanics: salted holistic aggregation (functions/skew.py) and
bucketed co-located joins (sources/bucketing.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from koby_s_ai_vector_db_spark.functions.skew import two_phase_collect
from koby_s_ai_vector_db_spark.sources.bucketing import colocated_join, write_bucketed
from koby_s_ai_vector_db_spark.sources.tables import load_table
from tests.conftest import SF_DIRS


def test_two_phase_collect_equals_direct(spark):
    """The salted two-phase collect must be indistinguishable from the
    direct groupBy-collect — same keys, same sorted arrays — including on
    a deliberately skewed key distribution (event_type has ~4 values for
    thousands of rows: every group is 'hot')."""
    ev = load_table(spark, SF_DIRS["t2"], "events").select(
        "event_type", F.struct("event_id", "user_id").alias("p")
    )
    salted = two_phase_collect(
        ev, ["event_type"], "p", out_col="items", n_salt=16, salt_on="p"
    )
    direct = ev.groupBy("event_type").agg(
        F.array_sort(F.collect_list("p")).alias("items")
    )
    s = {(r.event_type, tuple(map(tuple, r.items))) for r in salted.collect()}
    d = {(r.event_type, tuple(map(tuple, r.items))) for r in direct.collect()}
    assert s == d and len(s) > 0


def test_two_phase_collect_spreads_hot_key(spark):
    """Phase 1 must actually split a hot key: its pre-aggregate emits up
    to n_salt rows per key, not one."""
    ev = load_table(spark, SF_DIRS["t2"], "events").select(
        "event_type", F.struct("event_id").alias("p")
    )
    salt = F.pmod(F.xxhash64(F.col("p")), F.lit(8))
    n_subgroups = ev.groupBy("event_type", salt.alias("s")).count()
    per_key = n_subgroups.groupBy("event_type").count().agg(F.min("count")).first()[0]
    assert per_key == 8  # thousands of rows per type -> every salt bucket hit


def test_q12_skew_safe_context_identical(spark):
    """combined_context(skew_safe=True) must produce the byte-identical
    context strings: the salted two-phase path is a pure execution-strategy
    swap. Exercised on the real fusion inputs (bounded groups) — the
    hot-key scaling property itself is pinned by the two tests above."""
    from koby_s_ai_vector_db_spark.operators.fusion import (
        combined_context,
        fusion_metadata,
    )
    from koby_s_ai_vector_db_spark.queries.fusion_q import _inputs

    qtext, vec, vec_doc, lex = _inputs(spark, SF_DIRS["t1"])
    meta = fusion_metadata(qtext, vec, lex)
    direct = {
        r.query_id: r.combined_context
        for r in combined_context(vec_doc, lex, meta).collect()
    }
    salted = {
        r.query_id: r.combined_context
        for r in combined_context(vec_doc, lex, meta, skew_safe=True).collect()
    }
    assert direct == salted and len(direct) == 4


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Both sides bucketed by doc_id with equal counts: the sort-merge
    join's children need no Exchange — the write-time layout satisfies the
    join distribution. The same join on plain parquet shuffles both sides."""
    docs = load_table(spark, SF_DIRS["t1"], "documents")
    left = docs.select("doc_id", "text")
    right = docs.select("doc_id", "lang", "source")
    write_bucketed(left, "b_left", "doc_id", 8, path=str(tmp_path / "l"))
    write_bucketed(right, "b_right", "doc_id", 8, path=str(tmp_path / "r"))
    # Fixture tables are broadcast-sized, which would sideline the bucket
    # layout entirely; force the sort-merge path the join takes at scale.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, "b_left", "b_right", "doc_id")
        assert joined.count() == docs.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan

        plain = left.join(right, "doc_id")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plain_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_left")
        spark.sql("DROP TABLE IF EXISTS b_right")
