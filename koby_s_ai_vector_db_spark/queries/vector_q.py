"""Vector-search queries (SURVEY §2.3 Q1/Q2, §2.2 T3) wired to fixtures.

Query set: the first NQ vectors of `embeddings` act as query vectors over
the full table as corpus (self-matches included, sim=1.0 at rank 1 — same
as FAISS searching its own rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from koby_s_ai_vector_db_spark.functions.vectors import l2_normalize, sql_normalize
from koby_s_ai_vector_db_spark.operators.similarity import ivf_topk, knn_self_join, topk_cosine
from koby_s_ai_vector_db_spark.registry import register
from koby_s_ai_vector_db_spark.sources.tables import load_table

NQ = 8  # number of query vectors
K = 10
THRESHOLD = 0.15

_NORM_CTE = f"""
WITH c AS (
    SELECT vec_id, label, {sql_normalize('embedding')} AS v
    FROM embeddings
)
"""

_Q1_ORACLE = (
    _NORM_CTE
    + f"""
, q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < {NQ}),
scored AS (
    SELECT q.query_id, c.vec_id,
           list_sum(list_transform(c.v, (x, i) -> x * q.qv[i])) AS sim_raw
    FROM c CROSS JOIN q
),
ranked AS (
    SELECT query_id, vec_id, sim_raw,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY sim_raw DESC, vec_id ASC) AS rank
    FROM scored
)
SELECT query_id, vec_id, round(sim_raw, 6) AS sim, rank
FROM ranked WHERE rank <= {K} AND sim_raw >= {THRESHOLD}
"""
)


@register("q1_topk_cosine", _Q1_ORACLE)
def q1_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 (utils.py:194-254): exact top-k cosine, threshold after rank."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return topk_cosine(emb.select("vec_id", "embedding"), queries, k=K, threshold=THRESHOLD)


_T3_ORACLE = (
    _NORM_CTE
    + """
SELECT vec_id, round(list_sum(list_transform(v, x -> x * x)), 6) AS sq_norm,
       round(v[1], 6) AS first_component
FROM c
"""
)


@register("t3_normalize", _T3_ORACLE)
def t3_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 (utils.py:126-135): unit-norm check — ||v||² and first component."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = l2_normalize("embedding")
    return emb.select(
        "vec_id",
        F.round(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x), 6).alias("sq_norm"),
        F.round(F.element_at(v, 1), 6).alias("first_component"),
    )


_KNN_ORACLE = (
    _NORM_CTE
    + """
, scored AS (
    SELECT a.vec_id AS query_id, b.vec_id,
           list_sum(list_transform(a.v, (x, i) -> x * b.v[i])) AS sim_raw
    FROM c a CROSS JOIN c b
    WHERE a.vec_id <> b.vec_id AND a.vec_id < 64
),
ranked AS (
    SELECT query_id, vec_id, sim_raw,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY sim_raw DESC, vec_id ASC) AS rank
    FROM scored
)
SELECT query_id, vec_id, round(sim_raw, 6) AS sim, rank
FROM ranked WHERE rank <= 3
"""
)


@register("knn_self_join", _KNN_ORACLE)
def knn_self_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs 3-NN for the first 64 vectors (exact oracle for ANN ops)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return knn_self_join(emb, k=3, queries=emb.filter(F.col("vec_id") < 64))
