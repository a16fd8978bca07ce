"""Persisted product-quantization index — encode once, ADC-scan codes
forever.

Round-4 gap: `q2_ann_pq`/`q2_ann_ivfpq` (operators/pq.py, operators/
ivfpq.py) re-encode the full corpus (M·KS·SUB = 1024 codebook reads per
row) on EVERY query, which forfeits exactly the memory-bandwidth win PQ
exists for. The reference's analogue is the one-time ``CREATE INDEX``
(supabase_schema.sql:137-139) and FAISS's trained-then-serialized
IndexIVFPQ (the production successor of the reference's IndexFlatIP,
core/utils.py:203-214). Spark-first, the index IS a storage layout — the
same stance as the IVF index (sources/ivf.py):

  build (once)    encode vectors to M 4-bit codes; write ONE parquet table
                  ``{path}/data`` with columns (id, codes, vec) — IVFPQ
                  variant PARTITIONED BY coarse list id — plus tiny
                  ``codebook`` (and ``centroids``) sidecars.
  search (often)  read the codebook sidecar, build per-query ADC tables,
                  scan ``data`` selecting ONLY (id, codes): parquet
                  COLUMN pruning means the 256-byte vec bytes are never
                  read during the hot scan — the 64× smaller read is now
                  real I/O, not a projection after a full-width read.
                  IVFPQ adds PARTITION pruning: unprobed lists' files are
                  never opened (same static/dynamic choice as ivf.py).
                  The exact re-rank then re-reads ``data`` for the
                  |queries|·shortlist shortlist rows only, selecting
                  (id, vec).

One table, two prunings: column pruning separates WHAT is scanned (codes
vs vectors), partition pruning WHICH rows (probed lists). No second copy
of the vectors is needed for the re-rank fetch.

The deterministic md5-derived codebook (operators/pq.py) is persisted as
data rather than recomputed: search reads whatever codebook the build
wrote, so a learned per-subspace k-means codebook (FAISS
ProductQuantizer training) drops in without touching the search path.

Checked by tests/test_pq_index.py: search over the persisted index is
row-identical to the inline `pq_topk`/`ivfpq_topk` operators (same
codebook, same tie-breaks), and the ADC scan's parquet schema/partition
filters are plan-asserted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from koby_s_ai_vector_db_spark.functions.partitioning import spread
from koby_s_ai_vector_db_spark.functions.vectors import dot, l2_normalize
from koby_s_ai_vector_db_spark.operators.pq import (
    codebook_df,
    pq_adc_score,
    pq_distance_table,
    pq_encode,
)

DATA_SUBDIR = "data"
CODEBOOK_SUBDIR = "codebook"
CENTROIDS_SUBDIR = "centroids"
TOMBSTONES_SUBDIR = "tombstones"


def _tombstones(spark: SparkSession, path: str) -> DataFrame | None:
    """The deleted-id table, or None if nothing was ever deleted."""
    try:
        return spark.read.parquet(f"{path}/{TOMBSTONES_SUBDIR}")
    except Exception:
        return None


def _read_data(spark: SparkSession, path: str, corpus_id: str) -> DataFrame:
    """The live index rows: ``data`` minus tombstoned ids (FAISS
    `remove_ids` semantics — centroids and codebook stay frozen; a
    deleted vector simply stops being a candidate)."""
    data = spark.read.parquet(f"{path}/{DATA_SUBDIR}")
    tomb = _tombstones(spark, path)
    if tomb is not None:
        data = data.join(
            F.broadcast(tomb.withColumnRenamed("id", corpus_id)),
            corpus_id,
            "left_anti",
        )
    return data


def delete_from_index(
    spark: SparkSession,
    path: str,
    ids: DataFrame,
    corpus_id: str = "vec_id",
) -> dict:
    """Delete vectors from a flat-PQ or IVF+PQ index without a rewrite:
    append the ids to ``{path}/tombstones``; every search anti-joins them
    before the ADC scan, so a deleted vector can neither enter the
    shortlist nor crowd one out (removing it admits the next-best
    candidate — NOT equivalent to post-filtering search results).
    `compact_index` reclaims the rows physically. Repeated deletes are
    idempotent. Returns {"n_deleted", "path"}."""
    del_ids = ids.select(F.col(corpus_id).alias("id")).distinct()
    prior = _tombstones(spark, path)
    if prior is not None:
        del_ids = del_ids.join(prior, "id", "left_anti")
    # Only ids actually in the index become tombstones (bounded table).
    present = spark.read.parquet(f"{path}/{DATA_SUBDIR}").select(
        F.col(corpus_id).alias("id")
    )
    del_ids = del_ids.join(present, "id", "left_semi")
    n = del_ids.count()
    if n:
        del_ids.coalesce(1).write.mode("append").parquet(
            f"{path}/{TOMBSTONES_SUBDIR}"
        )
    return {"n_deleted": n, "path": path}


def compact_index(
    spark: SparkSession, path: str, corpus_id: str = "vec_id"
) -> dict:
    """Physically drop tombstoned rows, preserving the layout (list
    partitioning for IVF+PQ, flat otherwise) — FAISS's remove_ids
    actually reclaiming memory, as a batch rewrite. Search results are
    unchanged. Returns {"n_vectors", "path"}."""
    import os
    import shutil

    data = spark.read.parquet(f"{path}/{DATA_SUBDIR}")
    tomb = _tombstones(spark, path)
    if tomb is None:
        return {"n_vectors": data.count(), "path": path}
    live = data.join(
        F.broadcast(tomb.withColumnRenamed("id", corpus_id)),
        corpus_id,
        "left_anti",
    )
    tmp = f"{path}/.compact_tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    if "list" in data.columns:
        live.repartition("list").write.partitionBy("list").parquet(tmp)
    else:
        live.write.parquet(tmp)
    n = spark.read.parquet(tmp).count()
    shutil.rmtree(f"{path}/{DATA_SUBDIR}")
    os.rename(tmp, f"{path}/{DATA_SUBDIR}")
    shutil.rmtree(f"{path}/{TOMBSTONES_SUBDIR}", ignore_errors=True)
    return {"n_vectors": n, "path": path}


def _write_codebook(spark: SparkSession, path: str) -> None:
    codebook_df(spark).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/{CODEBOOK_SUBDIR}"
    )


def build_pq_index(
    corpus: DataFrame,
    path: str,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Flat PQ index: ``{path}/data`` (id, codes, vec) + codebook sidecar.

    Vectors are L2-normalized at build time (the reference's build-time
    normalize, embed_pdfs.py:207) so search is a plain dot product.
    Returns {"n_vectors", "path"}."""
    spark = corpus.sparkSession
    _write_codebook(spark, path)
    c = spread(corpus).select(
        F.col(corpus_id), l2_normalize(vec_col).alias("vec")
    )
    data = c.join(F.broadcast(codebook_df(spark))).select(
        corpus_id, pq_encode("vec").alias("codes"), "vec"
    )
    data.write.mode("overwrite").parquet(f"{path}/{DATA_SUBDIR}")
    n = spark.read.parquet(f"{path}/{DATA_SUBDIR}").count()
    return {"n_vectors": n, "path": path}


def build_ivfpq_index(
    corpus: DataFrame,
    path: str,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    list_col: str | None = None,
    n_lists: int = 10,
    max_iter: int = 5,
    seed: int = 20260813,
    dim: int = 64,
) -> dict:
    """IVF+PQ index: ``{path}/data`` (id, codes, vec) PARTITIONED BY the
    coarse ``list`` id, plus ``centroids`` and ``codebook`` sidecars.

    Coarse assignment: pass ``list_col`` to use an existing labeling with
    per-list mean centroids (deterministic — value-testable against the
    inline `ivfpq_topk`), or leave None to fit seeded k-means lists like
    sources/ivf.py (better recall; engine-specific floats, so recall- not
    value-tested). Returns {"n_lists", "n_vectors", "path"}."""
    spark = corpus.sparkSession
    _write_codebook(spark, path)
    c = spread(corpus)

    if list_col is not None:
        labeled = c.select(
            F.col(corpus_id),
            F.col(list_col).cast("int").alias("list"),
            l2_normalize(vec_col).alias("vec"),
        )
        centroids = (
            labeled.groupBy("list")
            .agg(
                *[
                    F.avg(F.element_at(F.col("vec"), i + 1)).alias(f"_c{i}")
                    for i in range(dim)
                ]
            )
            .select(
                "list",
                F.array(*[F.col(f"_c{i}") for i in range(dim)]).alias("centroid"),
            )
        )
        n_lists = None  # resolved below from the labeling
    else:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        norm = c.withColumn("_nv", l2_normalize(vec_col))
        feat = norm.withColumn(
            "_fv", array_to_vector(F.col("_nv").cast("array<double>"))
        )
        model = KMeans(
            k=n_lists, maxIter=max_iter, seed=seed,
            featuresCol="_fv", predictionCol="_list",
        ).fit(feat)
        labeled = model.transform(feat).select(
            corpus_id,
            F.col("_list").cast("int").alias("list"),
            F.col("_nv").alias("vec"),
        )
        centroids = spark.createDataFrame(
            [
                (i, [float(x) for x in ctr])
                for i, ctr in enumerate(model.clusterCenters())
            ],
            schema="list int, centroid array<double>",
        )

    data = labeled.join(F.broadcast(codebook_df(spark))).select(
        "list", F.col(corpus_id), pq_encode("vec").alias("codes"), "vec"
    )
    # repartition("list"): one writer task per list → a probe opens O(1)
    # files per probed partition instead of one per upstream task.
    data.repartition("list").write.mode("overwrite").partitionBy("list").parquet(
        f"{path}/{DATA_SUBDIR}"
    )
    centroids.coalesce(1).write.mode("overwrite").parquet(
        f"{path}/{CENTROIDS_SUBDIR}"
    )
    written = spark.read.parquet(f"{path}/{DATA_SUBDIR}")
    n_vectors = written.count()
    if n_lists is None:
        n_lists = written.select("list").distinct().count()
    return {"n_lists": n_lists, "n_vectors": n_vectors, "path": path}


def append_to_ivfpq_index(
    new_corpus: DataFrame,
    path: str,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Incrementally add vectors to an EXISTING IVF+PQ index without a
    rebuild: each new vector is assigned to its nearest existing coarse
    centroid (the FAISS `add` semantics — centroids and codebook are
    frozen at train time), encoded with the persisted codebook, and
    appended to its list partition (parquet append touches only the
    affected partitions' directories).

    This is the scale upgrade over the reference's wholesale re-index
    (embed_pdfs.py rebuilds the whole FAISS file per ingest): appending N
    vectors costs O(N · n_lists) centroid dots + N code encodes, never a
    corpus rescan. Centroid drift accumulates as data distribution moves —
    the rebuild knob stays `build_ivfpq_index`, exactly like pgvector's
    REINDEX guidance. Returns {"n_appended", "path"}."""
    spark = new_corpus.sparkSession
    cbdf = spark.read.parquet(f"{path}/{CODEBOOK_SUBDIR}")
    centroids = spark.read.parquet(f"{path}/{CENTROIDS_SUBDIR}")

    c = spread(new_corpus).select(
        F.col(corpus_id), l2_normalize(vec_col).alias("vec")
    )
    w = Window.partitionBy(corpus_id).orderBy(F.desc("csim"), F.asc("list"))
    assigned = (
        c.join(F.broadcast(centroids))
        .withColumn("csim", dot("vec", "centroid"))
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("list", corpus_id, "vec")
    )
    data = assigned.join(F.broadcast(cbdf)).select(
        "list", F.col(corpus_id), pq_encode("vec").alias("codes"), "vec"
    )
    data.repartition("list").write.mode("append").partitionBy("list").parquet(
        f"{path}/{DATA_SUBDIR}"
    )
    n_appended = assigned.count()
    return {"n_appended": n_appended, "path": path}


def _exact_rerank(
    data: DataFrame,
    sl: DataFrame,
    q_norm: DataFrame,
    k: int,
    corpus_id: str,
    query_id: str,
    round_to: int | None,
) -> DataFrame:
    """Shared re-rank tail: fetch the shortlist's full vectors from the
    index table (broadcast semi-join — |queries|·shortlist rows), exact
    dot, top-k. Both search paths must go through here so a tie-break or
    rounding change can never diverge them."""
    rer = (
        F.broadcast(sl)
        .join(data.select(corpus_id, "vec"), corpus_id)
        .join(F.broadcast(q_norm), query_id)
        .withColumn("sim", dot("vec", "qv"))
    )
    w_k = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.asc(corpus_id))
    sim = F.round("sim", round_to) if round_to is not None else F.col("sim")
    return (
        rer.withColumn("rank", F.row_number().over(w_k))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, sim.alias("sim"), "rank")
    )


def _adc_rerank(
    data: DataFrame,
    queries_dtab: DataFrame,
    q_norm: DataFrame,
    k: int,
    shortlist: int,
    corpus_id: str,
    query_id: str,
    round_to: int | None,
) -> DataFrame:
    """Shared search tail: ADC scan on (id, codes) → per-query shortlist →
    exact re-rank on the shortlist's (id, vec)."""
    w_sl = Window.partitionBy(query_id).orderBy(F.desc("adc"), F.asc(corpus_id))
    sl = (
        data.select(corpus_id, "codes")  # column pruning: vec never read here
        .join(F.broadcast(queries_dtab))
        .withColumn("adc", pq_adc_score())
        .withColumn("srank", F.row_number().over(w_sl))
        .filter(F.col("srank") <= shortlist)
        .select(query_id, corpus_id)
    )
    return _exact_rerank(data, sl, q_norm, k, corpus_id, query_id, round_to)


def pq_index_search(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 10,
    shortlist: int = 64,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    query_vec_col: str = "query_vec",
    round_to: int | None = 6,
) -> DataFrame:
    """Search a flat PQ index: codebook sidecar → per-query ADC tables →
    code-only scan → shortlist → exact re-rank. Row-identical to the
    inline `pq_topk` (tests/test_pq_index.py), minus the per-query encode
    cost. Returns (query_id, corpus_id, sim, rank)."""
    cbdf = spark.read.parquet(f"{path}/{CODEBOOK_SUBDIR}")
    data = _read_data(spark, path, corpus_id)
    q = queries.select(F.col(query_id), l2_normalize(query_vec_col).alias("qv"))
    dtab = q.join(F.broadcast(cbdf)).select(
        query_id, pq_distance_table("qv").alias("dtab")
    )
    return _adc_rerank(
        data, dtab, q, k, shortlist, corpus_id, query_id, round_to
    )


def ivfpq_index_search(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    shortlist: int = 64,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    query_vec_col: str = "query_vec",
    prune: str = "static",
    round_to: int | None = 6,
    probe_memo_key=None,
) -> DataFrame:
    """Search an IVF+PQ index: centroid probe → PARTITION-pruned,
    column-pruned ADC scan of probed lists' codes → shortlist → exact
    re-rank. ``prune`` as in sources/ivf.py: "static" collects the bounded
    probe-id set and pushes ``list IN (...)`` into the scan (guaranteed
    PartitionFilters); "dynamic" keeps the plan lazy and relies on
    dynamic partition pruning from the broadcast probe join."""
    if prune not in ("static", "dynamic"):
        raise ValueError(f"prune must be 'static' or 'dynamic', got {prune!r}")

    cbdf = spark.read.parquet(f"{path}/{CODEBOOK_SUBDIR}")
    centroids = spark.read.parquet(f"{path}/{CENTROIDS_SUBDIR}")
    data = _read_data(spark, path, corpus_id)

    q = queries.select(F.col(query_id), l2_normalize(query_vec_col).alias("qv"))
    probe_w = Window.partitionBy(query_id).orderBy(F.desc("csim"), F.asc("list"))
    probes = (
        q.join(F.broadcast(centroids))
        .withColumn("csim", dot("qv", "centroid"))
        .withColumn("prank", F.row_number().over(probe_w))
        .filter(F.col("prank") <= n_probe)
        .select(query_id, "list")
    )

    scan = data
    if prune == "static":
        # Bounded control collect; callers with a FIXED query set pass
        # probe_memo_key so it runs once per session, not per query build
        # (the construction-is-action-free invariant).
        def _probed():
            return sorted(
                {r["list"] for r in probes.select("list").distinct().collect()}
            )

        if probe_memo_key is None:
            probed = _probed()
        else:
            from koby_s_ai_vector_db_spark.functions.caching import memo_scalar

            probed = memo_scalar(
                spark, ("ivfpq_probed", probe_memo_key), _probed
            )
        scan = scan.filter(F.col("list").isin(probed))

    dtab = q.join(F.broadcast(cbdf)).select(
        query_id, pq_distance_table("qv").alias("dtab")
    )
    w_sl = Window.partitionBy(query_id).orderBy(F.desc("adc"), F.asc(corpus_id))
    sl = (
        scan.select("list", corpus_id, "codes")
        .join(F.broadcast(probes), on="list")
        .join(F.broadcast(dtab), on=query_id)
        .withColumn("adc", pq_adc_score())
        .withColumn("srank", F.row_number().over(w_sl))
        .filter(F.col("srank") <= shortlist)
        .select(query_id, corpus_id)
    )
    # Re-rank fetch by id across all partitions (shortlist rows only). The
    # unpartitioned-column read is fine: |queries|·shortlist lookups.
    return _exact_rerank(data, sl, q, k, corpus_id, query_id, round_to)
