"""Persisted inverted text index — tokenize once, BM25-scan postings
forever.

`operators/corpus.py::bm25_rank` re-tokenizes the corpus and recounts
df/dl on every call — correct, and the right shape for ad-hoc scoring, but
at 100 TB the tokenize+explode pass dwarfs the scoring join. Every search
engine persists the inverted index instead (the reference's production
analogue is Postgres' GIN index behind ILIKE/keyword search,
supabase_schema.sql; pgvector's `CREATE INDEX` is the same bargain for
vectors). Spark-first, the index IS a storage layout, like the IVF and PQ
indexes (sources/ivf.py, sources/pq_index.py):

  build (once)    ``{path}/postings``: (term, id, tf, dl) — document
                  length DENORMALIZED into each posting so search never
                  joins a doc-length table — PARTITIONED BY
                  ``bucket = hash(term) % n_buckets``;
                  ``{path}/terms``: (term, df) with the same bucketing;
                  ``{path}/stats``: one row (n_docs, avgdl).
  search (often)  hash the query's terms with the same function → the
                  probe touches only those buckets' partitions (files of
                  unprobed buckets are never opened); query terms and
                  their df are broadcast; the only full shuffle is the
                  per-(query, doc) score aggregation — the same key the
                  top-k needs.

The bucket hash is Spark's own `hash()` — it never crosses engines (both
build and probe run in Spark), so no portable-md5 detour is needed here.
Scoring semantics (k1/b, idf, rounded-score ranking) are shared with
`bm25_rank` via operators/corpus.py constants; search results are
row-identical to the in-memory operator (tests/test_text_index.py), so the
registered `bm25_rank_idx` query shares `bm25_rank`'s DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from koby_s_ai_vector_db_spark.operators.corpus import (
    BM25_B,
    BM25_K1,
    doc_lengths,
    term_postings,
)
from koby_s_ai_vector_db_spark.operators.dedup import words_expr

POSTINGS_SUBDIR = "postings"
TERMS_SUBDIR = "terms"
STATS_SUBDIR = "stats"
TOMBSTONES_SUBDIR = "tombstones"
DEFAULT_BUCKETS = 64


def _tombstones(spark: SparkSession, path: str) -> DataFrame | None:
    """The (id, up_to_seg) table of deletions, or None if nothing was
    ever deleted (the subdir only exists after a delete). A row hides an
    id's postings in generations <= up_to_seg — generations written
    AFTER the delete (an upsert's re-add) are visible again."""
    try:
        return spark.read.parquet(f"{path}/{TOMBSTONES_SUBDIR}")
    except Exception:
        return None


def _live(postings: DataFrame, tomb: DataFrame | None) -> DataFrame:
    """Postings minus tombstoned generations: keep a row unless a
    tombstone for its id covers its segment."""
    if tomb is None:
        return postings
    t = tomb.groupBy("id").agg(F.max("up_to_seg").alias("up_to_seg"))
    return (
        postings.join(F.broadcast(t), "id", "left")
        .filter(F.col("up_to_seg").isNull() | (F.col("seg") > F.col("up_to_seg")))
        .drop("up_to_seg")
    )


def _bucket(term_col: str, n_buckets: int) -> F.Column:
    return F.pmod(F.hash(F.col(term_col)), F.lit(n_buckets)).cast("int")


def build_text_index(
    docs: DataFrame,
    path: str,
    n_buckets: int = DEFAULT_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Tokenize + invert once; persist bucket-partitioned postings/terms
    and the corpus-scalar sidecar. Returns {"n_docs", "n_terms", "path"}."""
    spark = docs.sparkSession
    _write_segment(docs, path, n_buckets, id_col, text_col, mode="overwrite")
    n_terms = (
        spark.read.parquet(f"{path}/{TERMS_SUBDIR}")
        .select("term").distinct().count()
    )
    n_docs = int(
        spark.read.parquet(f"{path}/{STATS_SUBDIR}").head()["n_docs"]
    )
    return {"n_docs": n_docs, "n_terms": n_terms, "path": path,
            "n_buckets": n_buckets}


def _write_segment(
    docs: DataFrame,
    path: str,
    n_buckets: int,
    id_col: str,
    text_col: str,
    mode: str,
    seg: int = 0,
) -> None:
    """Write one index segment (postings + per-segment term df + one stats
    row). Every aggregate the search needs is ADDITIVE across segments
    (df, n_docs, sum_dl), so append-mode segments compose exactly —
    the Lucene-segment idea without the merge daemon. ``seg`` stamps the
    postings rows with their segment generation: deletes are scoped to
    the generations that existed when they were issued, so an id
    re-added by a later upsert is visible again."""
    post = term_postings(docs, id_col, text_col).persist()
    dl = doc_lengths(docs, id_col, text_col).persist()
    try:
        postings = (
            post.join(dl, "_id")
            .select(
                _bucket("term", n_buckets).alias("bucket"),
                "term",
                F.col("_id").alias("id"),
                "tf",
                "dl",
                F.lit(seg).cast("int").alias("seg"),
            )
        )
        # One writer task per bucket: a probed partition is O(1) files.
        postings.repartition("bucket").write.mode(mode).partitionBy(
            "bucket"
        ).parquet(f"{path}/{POSTINGS_SUBDIR}")

        terms = (
            post.groupBy("term")
            .agg(F.count("*").cast("double").alias("df"))
            .select(_bucket("term", n_buckets).alias("bucket"), "term", "df")
        )
        terms.repartition("bucket").write.mode(mode).partitionBy(
            "bucket"
        ).parquet(f"{path}/{TERMS_SUBDIR}")

        # n_buckets is part of the ON-DISK layout (it defines which
        # partition a term lives in), so it is persisted with the stats and
        # read back at search time — a caller-supplied mismatch would
        # silently hash query terms into the wrong partitions.
        stats = dl.agg(
            F.count("*").cast("double").alias("n_docs"),
            F.sum("dl").alias("sum_dl"),
        ).withColumn("n_buckets", F.lit(n_buckets))
        stats.coalesce(1).write.mode(mode).parquet(f"{path}/{STATS_SUBDIR}")
    finally:
        post.unpersist()
        dl.unpersist()


def append_to_text_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Incrementally add documents to an existing index as a new SEGMENT:
    postings/terms/stats rows are parquet-appended; search sums the
    per-segment df and corpus scalars, which is exact because every BM25
    global (df, N, total length) is additive. No old data is rescanned —
    the upgrade over the reference's wholesale re-embed per ingest.
    The bucket count is read from the index (layout-frozen at build)."""
    spark = docs.sparkSession
    stats = spark.read.parquet(f"{path}/{STATS_SUBDIR}")
    n_buckets = int(stats.head()["n_buckets"])
    # Next generation id: one column-pruned scan of the postings table.
    seg = int(
        spark.read.parquet(f"{path}/{POSTINGS_SUBDIR}")
        .agg(F.max("seg")).head()[0]
    ) + 1
    _write_segment(
        docs, path, n_buckets, id_col, text_col, mode="append", seg=seg
    )
    return {"n_appended": docs.count(), "path": path, "n_buckets": n_buckets}


def delete_from_text_index(
    spark: SparkSession,
    path: str,
    ids: DataFrame,
    id_col: str = "doc_id",
) -> dict:
    """Delete documents from the index WITHOUT rewriting it — Lucene's
    tombstone semantics expressed through the index's own additive
    algebra. Two things are written, both tiny:

      1. the deleted ids append to ``{path}/tombstones`` — search
         anti-joins them so deleted postings stop matching;
      2. a NEGATIVE correction segment: per-(bucket, term) df rows with
         negative counts and a stats row with negative n_docs/sum_dl,
         derived from the deleted docs' own postings. Because every BM25
         global is summed across segments at search time, the negative
         segment makes idf/N/avgdl exact again with ZERO search-side
         changes — deletes reuse the same mechanism appends do.

    Ids already tombstoned (or never indexed) are ignored — a repeated
    delete must not double-subtract. `compact_text_index` later applies
    tombstones physically and clears them. Returns {"n_deleted", "path"}.
    """
    stats = spark.read.parquet(f"{path}/{STATS_SUBDIR}")
    n_buckets = int(stats.head()["n_buckets"])

    del_ids = ids.select(F.col(id_col).alias("id")).distinct()
    # The correction segment needs the deleted docs' term sets — they are
    # IN the index; one postings pass per delete batch, not per search.
    # Corrections derive from the LIVE rows only: an id already deleted
    # (no live postings) contributes nothing and gets no new tombstone,
    # so repeated deletes never double-subtract; an id re-added since an
    # earlier delete has live rows again and is deleted afresh.
    postings = spark.read.parquet(f"{path}/{POSTINGS_SUBDIR}")
    live = _live(postings, _tombstones(spark, path))
    deleted_post = live.join(F.broadcast(del_ids), "id").persist()
    try:
        n_deleted = deleted_post.select("id").distinct().count()
        if n_deleted == 0:
            return {"n_deleted": 0, "path": path}
        up_to = int(postings.agg(F.max("seg")).head()[0])
        neg_terms = deleted_post.groupBy("bucket", "term").agg(
            (-F.count("*")).cast("double").alias("df")
        )
        neg_terms.repartition("bucket").write.mode("append").partitionBy(
            "bucket"
        ).parquet(f"{path}/{TERMS_SUBDIR}")
        neg_stats = (
            deleted_post.select("id", "seg", "dl")
            .distinct()
            .agg(
                (-F.count("*")).cast("double").alias("n_docs"),
                (-F.sum("dl")).alias("sum_dl"),
            )
            .withColumn("n_buckets", F.lit(n_buckets))
        )
        neg_stats.coalesce(1).write.mode("append").parquet(
            f"{path}/{STATS_SUBDIR}"
        )
        deleted_post.select("id").distinct().withColumn(
            "up_to_seg", F.lit(up_to).cast("int")
        ).coalesce(1).write.mode("append").parquet(
            f"{path}/{TOMBSTONES_SUBDIR}"
        )
    finally:
        deleted_post.unpersist()
    return {"n_deleted": n_deleted, "path": path}


def search_text_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    query_text: str = "query_text",
    id_col: str = "doc_id",
    k1: float = BM25_K1,
    b: float = BM25_B,
    round_to: int = 6,
    prune: str = "static",
    probe_memo_key=None,
) -> DataFrame:
    """BM25 top-k per query over the persisted index. The bucket count is
    read from the index's stats sidecar (it defines the partition layout —
    never caller-supplied at search time).

    ``prune="static"`` collects the query terms' bucket ids (bounded by the
    number of distinct query terms — not a data collect) and pushes
    ``bucket IN (...)`` into both scans: partitions of unprobed buckets are
    never opened. ``prune="dynamic"`` stays lazy and relies on the
    broadcast join for runtime partition pruning."""
    if prune not in ("static", "dynamic"):
        raise ValueError(f"prune must be 'static' or 'dynamic', got {prune!r}")

    seg_stats = spark.read.parquet(f"{path}/{STATS_SUBDIR}")
    if "n_buckets" not in seg_stats.columns:
        raise ValueError(
            f"{path}/{STATS_SUBDIR} has no n_buckets column — index built "
            "by an older build_text_index; rebuild it"
        )
    # n_buckets defines the immutable partition layout of THIS index path
    # (append/delete never change it), so the 1-row read memoizes per
    # (application, path) — a per-build head() was a Spark job per query
    # construction (the construction-is-action-free invariant).
    from koby_s_ai_vector_db_spark.functions.caching import memo_scalar

    n_buckets = memo_scalar(
        spark,
        ("textidx_n_buckets", path),
        lambda: int(seg_stats.head()["n_buckets"]),
    )
    # Segments are additive: N = Σ n_docs, avgdl = Σ sum_dl / N.
    stats = seg_stats.agg(
        F.sum("n_docs").alias("n_docs"),
        (F.sum("sum_dl") / F.sum("n_docs")).alias("avgdl"),
    )

    qterms = queries.select(
        F.col(query_id),
        F.explode(F.array_distinct(words_expr(query_text))).alias("term"),
    ).withColumn("bucket", _bucket("term", n_buckets))

    postings = spark.read.parquet(f"{path}/{POSTINGS_SUBDIR}")
    terms = spark.read.parquet(f"{path}/{TERMS_SUBDIR}")
    if prune == "static":
        # Bounded control collect (distinct query-term buckets). Callers
        # with a FIXED query set pass probe_memo_key so the collect runs
        # once per session instead of on every query build (the
        # construction-is-action-free invariant); ad-hoc callers leave it
        # None and pay the collect per call.
        def _buckets():
            return sorted(
                {r["bucket"] for r in qterms.select("bucket").distinct().collect()}
            )

        if probe_memo_key is None:
            buckets = _buckets()
        else:
            from koby_s_ai_vector_db_spark.functions.caching import memo_scalar

            buckets = memo_scalar(
                spark, ("textidx_buckets", probe_memo_key), _buckets
            )
        postings = postings.filter(F.col("bucket").isin(buckets))
        terms = terms.filter(F.col("bucket").isin(buckets))
    # Deleted docs: the generation-scoped tombstone filter hides their
    # postings; the df/N/avgdl corrections already arrived through the
    # negative segments' additive sums above (delete_from_text_index).
    postings = _live(postings, _tombstones(spark, path))

    # df per query term, summed across segments: both sides of this join
    # are tiny after pruning; the result (≤ distinct query terms rows) is
    # broadcast into scoring.
    term_df = terms.groupBy("bucket", "term").agg(F.sum("df").alias("df"))
    q_df = qterms.join(term_df, ["bucket", "term"]).select(query_id, "term", "df")

    scored = (
        postings.join(F.broadcast(q_df), ["term"])
        .join(F.broadcast(stats.select("n_docs", "avgdl")))
        .withColumn(
            "_idf",
            F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)),
        )
        .withColumn(
            "_w",
            F.col("_idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy(query_id, "id")
        .agg(F.sum("_w").alias("_score"))
    )
    # Rounded-score ranking: same cross-engine determinism contract as
    # operators/corpus.py::bm25_rank.
    w = Window.partitionBy(query_id).orderBy(
        F.desc(F.round("_score", round_to)), F.asc("id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id,
            F.col("id").alias(id_col),
            F.round("_score", round_to).alias("score"),
            "rank",
        )
    )


def compact_text_index(spark: SparkSession, path: str) -> dict:
    """Merge all segments into one: per-(bucket, term) df rows are summed,
    the stats sidecar collapses to a single row, and each bucket's
    postings are rewritten as one coherent partition (one writer task per
    bucket) instead of one file set per appended segment. Search results
    are unchanged — compaction only moves the additive df/stats summing
    from query time to write time and fixes small-file proliferation:
    after S appends a probe opens O(S) files per bucket, after compaction
    O(1). This is Lucene's segment merge as a batch job.

    Locally the swap is rewrite-to-tmp + directory rename; on a real
    cluster the same step writes a new index root and flips a manifest
    pointer (parquet has no transactional overwrite-in-place).
    Returns {"n_segments_before", "n_postings", "path"}.
    """
    import os
    import shutil

    stats = spark.read.parquet(f"{path}/{STATS_SUBDIR}")
    n_buckets = int(stats.head()["n_buckets"])
    n_segments = stats.count()

    merged_stats = stats.agg(
        F.sum("n_docs").alias("n_docs"), F.sum("sum_dl").alias("sum_dl")
    ).withColumn("n_buckets", F.lit(n_buckets))
    # Delete correction segments sum in here: a fully-deleted term nets
    # df <= 0 and is dropped from the compacted terms table.
    merged_terms = (
        spark.read.parquet(f"{path}/{TERMS_SUBDIR}")
        .groupBy("bucket", "term")
        .agg(F.sum("df").alias("df"))
        .filter(F.col("df") > 0)
    )
    # Apply tombstones physically: compaction is where Lucene reclaims
    # deleted docs; afterwards the tombstone table is empty again and
    # every surviving row restarts at generation 0.
    postings = _live(
        spark.read.parquet(f"{path}/{POSTINGS_SUBDIR}"),
        _tombstones(spark, path),
    ).withColumn("seg", F.lit(0).cast("int"))

    tmp = f"{path}/.compact_tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    # Materialize the new segment fully before touching the old one.
    postings.repartition("bucket").write.partitionBy("bucket").parquet(
        f"{tmp}/{POSTINGS_SUBDIR}"
    )
    merged_terms.repartition("bucket").write.partitionBy("bucket").parquet(
        f"{tmp}/{TERMS_SUBDIR}"
    )
    merged_stats.coalesce(1).write.parquet(f"{tmp}/{STATS_SUBDIR}")
    n_postings = int(
        spark.read.parquet(f"{tmp}/{POSTINGS_SUBDIR}").count()
    )
    for sub in (POSTINGS_SUBDIR, TERMS_SUBDIR, STATS_SUBDIR):
        shutil.rmtree(f"{path}/{sub}")
        os.rename(f"{tmp}/{sub}", f"{path}/{sub}")
    shutil.rmtree(tmp, ignore_errors=True)
    # Tombstoned docs are physically gone now.
    shutil.rmtree(f"{path}/{TOMBSTONES_SUBDIR}", ignore_errors=True)
    return {
        "n_segments_before": n_segments,
        "n_postings": n_postings,
        "path": path,
    }


def upsert_to_text_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Replace-or-insert documents: delete any existing rows for these
    ids (tombstone + negative corrections), then append the new contents
    as a fresh segment — the reference's filename-keyed re-ingest
    (core/supabase_utils.py:203-248 deletes a document's chunks before
    re-inserting) expressed as index operations. Search afterwards is
    exact for the NEW contents (rebuild-equivalent, same argument as
    delete + append). Returns {"n_replaced", "n_upserted", "path"}."""
    spark = docs.sparkSession
    deleted = delete_from_text_index(
        spark, path, docs.select(id_col), id_col=id_col
    )
    appended = append_to_text_index(docs, path, id_col, text_col)
    return {
        "n_replaced": deleted["n_deleted"],
        "n_upserted": appended["n_appended"],
        "path": path,
    }
