"""IVF+PQ composed ANN — the FAISS ``IndexIVFPQ`` shape on DataFrames.

The two approximate tiers compose orthogonally, exactly as in FAISS (the
production successor of the reference's IndexFlatIP, core/utils.py:203-214;
its pgvector tier is plain IVF, supabase_schema.sql:137-139):

  IVF  prunes WHICH rows are scanned  — probe the n_probe nearest coarse
       cells; at scale the corpus is partitioned by cell id so unprobed
       partitions are never read (sources/ivf.py persists that layout);
  PQ   shrinks WHAT is scanned        — inside probed cells the ADC pass
       reads 4-byte codes, not 256-byte vectors (operators/pq.py).

Search: probe cells (broadcast centroid ranking, tiny) → ADC over the
probed cells' codes via per-query distance tables (map-side lookups) →
per-query shortlist (WindowGroupLimit pre-truncates map-side) → fetch the
shortlist's full vectors → exact re-rank. Cost at 100 TB:
(n_probe/n_lists) of the corpus scanned, at 1/64th the bytes, plus
|queries| x shortlist full-precision fetches.

Everything is deterministic (per-cell mean centroids, literal md5-derived
codebooks, ties to lower id), so the whole composition is value-checked
against a DuckDB oracle — unlike learned k-means tiers which are
recall-tested only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from koby_s_ai_vector_db_spark.functions.partitioning import spread
from koby_s_ai_vector_db_spark.functions.vectors import dot, l2_normalize
from koby_s_ai_vector_db_spark.operators.pq import (
    codebook_df,
    pq_adc_score,
    pq_distance_table,
    pq_encode,
)


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe_labels: int = 2,
    shortlist: int = 64,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    query_vec_col: str = "query_vec",
    label_col: str = "label",
    round_to: int | None = 6,
    dim: int = 64,
    cache_key=None,
) -> DataFrame:
    """IVF probe -> PQ ADC shortlist -> exact re-rank.

    Returns (query_id, corpus_id, sim, rank) with EXACT re-ranked scores.
    Recall is bounded above by the IVF probe (rows outside probed cells are
    invisible) and tuned within it by `shortlist`.

    `cache_key` memo-persists the centroid table and the encoded
    (label, id, codes) subtree per session — the per-call costs that the
    persisted artifact (sources/pq_index.py) eliminates durably."""
    from koby_s_ai_vector_db_spark.functions.caching import memo_persist

    spark = corpus.sparkSession
    c = spread(corpus).select(
        F.col(corpus_id), F.col(label_col), l2_normalize(vec_col).alias("v")
    )

    # Coarse centroids: per-label mean as dim parallel avg() aggregates —
    # one map-side-combined shuffle of n_lists x dim scalars (the same
    # shape as operators/similarity.py::ivf_topk, see the note there).
    def _centroids():
        return (
            c.groupBy(label_col)
            .agg(
                *[
                    F.avg(F.element_at(F.col("v"), i + 1)).alias(f"_c{i}")
                    for i in range(dim)
                ]
            )
            .select(
                label_col,
                F.array(*[F.col(f"_c{i}") for i in range(dim)]).alias("centroid"),
            )
        )

    centroids = (
        memo_persist(spark, ("ivfpq_centroids", cache_key), _centroids)
        if cache_key is not None
        else _centroids()
    )

    q = queries.select(
        F.col(query_id), l2_normalize(query_vec_col).alias("qv")
    )
    probe_w = Window.partitionBy(query_id).orderBy(
        F.desc("csim"), F.asc(label_col)
    )
    probes = (
        q.join(F.broadcast(centroids))
        .withColumn("csim", dot("qv", "centroid"))
        .withColumn("prank", F.row_number().over(probe_w))
        .filter(F.col("prank") <= n_probe_labels)
        .select(query_id, label_col)
    )

    # The compressed per-cell index: at scale this (label, vec_id, codes)
    # projection is the persisted artifact (partitioned by label), and the
    # probe join becomes partition pruning — codes of unprobed cells are
    # never read.
    cbdf = codebook_df(corpus.sparkSession)

    def _codes():
        return c.join(F.broadcast(cbdf)).select(
            label_col, corpus_id, pq_encode("v").alias("codes")
        )

    codes = (
        memo_persist(spark, ("ivfpq_codes", cache_key), _codes)
        if cache_key is not None
        else _codes()
    )
    dtab = q.join(F.broadcast(cbdf)).select(
        query_id, pq_distance_table("qv").alias("dtab")
    )

    w_sl = Window.partitionBy(query_id).orderBy(F.desc("adc"), F.asc(corpus_id))
    sl = (
        codes.join(F.broadcast(probes), on=label_col)
        .join(F.broadcast(dtab), on=query_id)
        .withColumn("adc", pq_adc_score())
        .withColumn("srank", F.row_number().over(w_sl))
        .filter(F.col("srank") <= shortlist)
        .select(query_id, corpus_id)
    )

    rer = (
        F.broadcast(sl)
        .join(c.select(corpus_id, "v"), corpus_id)
        .join(F.broadcast(q), query_id)
        .withColumn("sim", dot("v", "qv"))
    )
    w_k = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.asc(corpus_id))
    sim = F.round("sim", round_to) if round_to is not None else F.col("sim")
    return (
        rer.withColumn("rank", F.row_number().over(w_k))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, sim.alias("sim"), "rank")
    )
