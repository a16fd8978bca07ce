"""S4 at scale: a persisted IVF index — build once, probe with partition
pruning.

The reference persists its index as `faiss_index.bin` + `metadata.json`,
re-read from disk on every query (core/utils.py:203-204,
core/management/commands/embed_pdfs.py:222-244), and its approximate tier
is pgvector ivfflat — k-means lists built once by `CREATE INDEX`
(supabase_schema.sql:137-139), probed per query.

Spark-first, the index IS a storage layout:

  build (once)   k-means lists (MLlib, seeded) over L2-normalized vectors,
                 written as parquet PARTITIONED BY list id, plus a tiny
                 centroid sidecar table — the analogue of the .bin/.json
                 pair, but splittable, schema'd, and readable by any
                 engine.
  search (often) rank centroids per query (broadcast, tiny), then scan
                 ONLY the probed list partitions: either Spark's dynamic
                 partition pruning (the broadcast probe join injects a
                 partition filter at runtime) or an explicit static IN
                 filter from the collected probe set (bounded by
                 |queries| x n_probe ids — NOT a data collect).

At 100 TB the win is exactly the pgvector one: a probe touches
n_probe/n_lists of the corpus, and the partition filter means those bytes
are never read off disk, not merely filtered after the scan. Centroid
drift is handled the ivfflat way: rebuild (re-run `build_ivf_index`).

Iterative float k-means makes centroids engine-specific, so this module is
checked by recall/equivalence tests (tests/test_ivf_index.py) rather than
a cross-engine value oracle; the probe SEMANTICS are oracle-checked via
the registered `q2_ann` (operators/similarity.py `ivf_topk`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from koby_s_ai_vector_db_spark.functions.partitioning import spread
from koby_s_ai_vector_db_spark.functions.vectors import dot, l2_normalize

LISTS_SUBDIR = "lists"
CENTROIDS_SUBDIR = "centroids"


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    n_lists: int = 10,
    max_iter: int = 5,
    seed: int = 20260813,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Fit k-means lists and persist `{path}/lists` (vectors, partitioned
    by `list`) + `{path}/centroids` (one small row per list). Vectors are
    L2-normalized at write time (the reference's build-time normalize,
    embed_pdfs.py:207) so the query path is a plain dot product.

    Returns {"n_lists", "n_vectors", "path"}."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = corpus.sparkSession
    c = spread(corpus).withColumn(vec_col, l2_normalize(vec_col))
    feat = c.withColumn("_fv", array_to_vector(F.col(vec_col).cast("array<double>")))
    model = KMeans(
        k=n_lists, maxIter=max_iter, seed=seed, featuresCol="_fv", predictionCol="_list"
    ).fit(feat)

    labeled = model.transform(feat).select(
        corpus_id, F.col("_list").cast("int").alias("list"), vec_col
    )
    # One file per list per task is fine here; at cluster scale add
    # .repartition("list") so each list is written by one task and a probe
    # opens O(1) files per list.
    labeled.write.mode("overwrite").partitionBy("list").parquet(f"{path}/{LISTS_SUBDIR}")

    centers = [
        (i, [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())
    ]
    spark.createDataFrame(centers, schema="list int, centroid array<double>").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{path}/{CENTROIDS_SUBDIR}")

    n_vectors = labeled.count()
    return {"n_lists": n_lists, "n_vectors": n_vectors, "path": path}


def ivf_index_search(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    threshold: float | None = None,
    query_id: str = "query_id",
    query_vec_col: str = "query_vec",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    prune: str = "static",
    round_to: int | None = 6,
    probe_memo_key=None,
) -> DataFrame:
    """Probe a persisted IVF index: top-`n_probe` centroid lists per query,
    exact rank-then-filter cosine search inside probed lists only
    (the reference's ivfflat query, supabase_schema.sql:144-171).

    prune="static"  collect the probed list ids (a bounded id set,
                    <= |queries| x n_probe ints — not a data collect) and
                    push `list IN (...)` into the scan: guaranteed
                    PartitionFilters, partitions never read.
    prune="dynamic" no collect; the broadcast probe join lets Spark inject
                    a dynamic-partition-pruning filter at runtime. Same
                    I/O win, fully lazy — preferred inside larger plans
                    where an eager collect would split the job.
    Returns (query_id, corpus_id, sim, rank)."""
    if prune not in ("static", "dynamic"):
        raise ValueError(f"prune must be 'static' or 'dynamic', got {prune!r}")

    centroids = spark.read.parquet(f"{path}/{CENTROIDS_SUBDIR}")
    q = queries.withColumn(query_vec_col, l2_normalize(query_vec_col))

    probe_w = Window.partitionBy(query_id).orderBy(F.desc("csim"), F.asc("list"))
    probes = (
        q.join(F.broadcast(centroids))
        .withColumn("csim", dot(query_vec_col, "centroid"))
        .withColumn("prank", F.row_number().over(probe_w))
        .filter(F.col("prank") <= n_probe)
        .select(query_id, query_vec_col, "list")
    )

    lists = spark.read.parquet(f"{path}/{LISTS_SUBDIR}")
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

            probed = memo_scalar(spark, ("ivf_probed", probe_memo_key), _probed)
        lists = lists.filter(F.col("list").isin(probed))
    scored = lists.join(F.broadcast(probes), on="list").withColumn(
        "sim", dot(vec_col, query_vec_col)
    )

    w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.asc(corpus_id))
    ranked = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
    if threshold is not None:
        ranked = ranked.filter(F.col("sim") >= threshold)  # rank-then-filter
    sim = F.round("sim", round_to) if round_to is not None else F.col("sim")
    return ranked.select(query_id, corpus_id, sim.alias("sim"), "rank")
