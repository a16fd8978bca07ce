"""Bucketed tables: pre-shuffled storage for co-located joins.

At 100 TB the repeated cost is not one join's shuffle but the SAME shuffle
every pipeline run: chunks join documents on doc_id, embeddings join
chunks on vec_id, events join sessions on user_id — same keys, every day.
Bucketing moves that exchange to write time: both tables are written
`bucketBy(n, key)` (+ `sortBy` for merge-ready runs), and every subsequent
equi-join on the key runs with NO Exchange on either side — the scan's
bucket layout satisfies the join's required distribution, which `.explain`
shows as a SortMergeJoin with no Exchange beneath it
(tests/test_bucketing.py asserts exactly that).

Rules that make it work (and that the helpers below encode):
  - both sides bucketed by the SAME column set and bucket count (Spark
    can also coalesce mismatched counts when one divides the other —
    spark.sql.bucketing.coalesceBucketsInJoin.enabled);
  - bucket count sized so one bucket fits an executor core's memory at
    the target scale (one task reads exactly one bucket);
  - written via saveAsTable (bucket metadata lives in the catalog; a bare
    parquet path has no bucket spec).

The reference has no analogue — its joins are per-request Python loops
over pgvector/FAISS results — but any long-lived deployment of this
engine would bucket the chunk/embedding tables exactly like this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist `df` as a bucketed catalog table (external when `path` is
    given). `sort=True` also sorts within buckets so bucketed sort-merge
    joins skip the per-task sort."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str]
) -> DataFrame:
    """Equi-join two identically-bucketed catalog tables on their bucket
    key — shuffle-free by construction (asserted in tests)."""
    return spark.table(left_table).join(spark.table(right_table), on)
