"""Ingest-path queries: T2 embedding UDF, S8 pipeline, U2 no-key answer,
T5 preview, T6 validation, T7 sanitize — all oracle-checked (the
deterministic hash embedder makes even the pandas_udf stage checkable)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from koby_s_ai_vector_db_spark.functions.embedding import embed_texts, sql_embed
from koby_s_ai_vector_db_spark.functions.vectors import l2_norm, sql_normalize
from koby_s_ai_vector_db_spark.operators.text_ops import (
    NOKEY_EMPTY,
    NOKEY_PREFIX,
    is_valid_question,
    nokey_answer,
    preview,
    sanitize_filename,
)
from koby_s_ai_vector_db_spark.pipelines.ingest import build_chunk_index
from koby_s_ai_vector_db_spark.queries.chunker_q import OVERLAP, SIZE, chunks_cte
from koby_s_ai_vector_db_spark.queries.fusion_q import _Q12_ORACLE, QUERIES, _inputs
from koby_s_ai_vector_db_spark.operators.fusion import combined_context, fusion_metadata
from koby_s_ai_vector_db_spark.registry import register
from koby_s_ai_vector_db_spark.sources.tables import load_table

_STRIP_DUCK = "^[ \\t\\n\\r\\f]+|[ \\t\\n\\r\\f]+$"
TS_PREFIX = "20240125120000"  # NOW_TS as %Y%m%d%H%M%S (supabase_utils.py:146)


_T2_ORACLE = f"""
WITH e AS (SELECT doc_id, {sql_embed('text')} AS e FROM documents)
SELECT doc_id,
       round(e[1], 6) AS e0,
       round(e[8], 6) AS e7,
       round(list_sum(list_transform(e, x -> x * x)), 6) AS sq_norm
FROM e
"""


@register("t2_embed", _T2_ORACLE)
def t2_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2/U1 (utils.py:105-124): the Arrow-batched embedding pandas_udf
    with per-executor lazy model init, over the deterministic hash model
    (functions/embedding.py). Components + squared norm are checked."""
    docs = load_table(spark, sf_dir, "documents")
    e = docs.withColumn("e", embed_texts("text"))
    return e.select(
        "doc_id",
        F.round(F.element_at("e", 1), 6).alias("e0"),
        F.round(F.element_at("e", 8), 6).alias("e7"),
        F.round(F.aggregate("e", F.lit(0.0), lambda a, x: a + x * x), 6).alias("sq_norm"),
    )


_S8_ORACLE = (
    chunks_cte()
    + f"""
, emb AS (SELECT doc_id, {sql_embed('text')} AS e FROM chunk_rows),
nrm AS (
    SELECT doc_id,
           sqrt(list_sum(list_transform({sql_normalize('e')}, x -> x * x))) AS n
    FROM emb
),
per_doc AS (
    SELECT doc_id, count(*) AS chunk_count, round(avg(n), 6) AS mean_norm
    FROM nrm GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(p.chunk_count, 0) AS BIGINT) AS chunk_count,
       CASE WHEN coalesce(p.chunk_count, 0) > 0 THEN 'indexed' ELSE 'uploaded' END AS status,
       p.mean_norm
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""
)


@register("s8_ingest", _S8_ORACLE)
def s8_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 (supabase_utils.py:203-248, embed_pdfs.py:59-244): the full
    chunk→embed→normalize→catalog-flip chain in one job; unit mean-norm
    proves the normalize stage ran over the UDF output. The parquet
    write/read leg is exercised in tests/test_ingest.py.

    Round-13 optimization (guide §2.4): chunk_count and mean_norm come
    from ONE aggregate over ONE chunk→embed pass. The old shape ran the
    catalog flip (flip_catalog_status) and the norm aggregate as two
    independent arms, each re-chunking the corpus from scratch — two
    scans, two chunk Generates, two exchanges; the flip's count equals
    the norm arm's per-doc row count (same Generate + same non-empty
    filter), so the second chunker pass computed nothing new. Plan:
    2 scans + 2 Generate + 2 aggregate exchanges → 1 each
    (plans/r13/s8_ingest_{before,after}.txt); values unchanged
    (count(*) and avg(n) over the identical row set)."""
    docs = load_table(spark, sf_dir, "documents")
    index = build_chunk_index(docs, chunk_size=SIZE, overlap=OVERLAP)
    per_doc = (
        index.withColumn("n", l2_norm("embedding"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("chunk_count"),
            F.round(F.avg("n"), 6).alias("mean_norm"),
        )
    )
    chunk_count = F.coalesce("chunk_count", F.lit(0))
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        chunk_count.alias("chunk_count"),
        F.when(chunk_count > 0, F.lit("indexed"))
        .otherwise(F.lit("uploaded"))
        .alias("status"),
        "mean_norm",
    )


_QVALS = ", ".join(f"({qid}, '{txt}')" for qid, txt in QUERIES)

_U2_ORACLE = f"""
WITH ctx AS (
{_Q12_ORACLE}
)
SELECT c.query_id,
       '{NOKEY_PREFIX}'
       || E'\\n\\nQuestion: ' || q.query_text
       || E'\\n\\nRelevant context:\\n'
       || substr(CASE WHEN regexp_replace(c.combined_context, '{_STRIP_DUCK}', '', 'g') = ''
                      THEN '{NOKEY_EMPTY}'
                      ELSE regexp_replace(c.combined_context, '{_STRIP_DUCK}', '', 'g') END,
                 1, 1500) AS answer
FROM ctx c JOIN (VALUES {_QVALS}) q(query_id, query_text) ON c.query_id = q.query_id
"""


@register("u2_nokey_answer", _U2_ORACLE)
def u2_nokey_answer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 (views.py:164-220, fallback :167-180): the deterministic no-key
    answer over the Q12 combined contexts — closes the /api/ask lifecycle
    without an external LLM."""
    qtext, vec, vec_doc, lex = _inputs(spark, sf_dir)
    meta = fusion_metadata(qtext, vec, lex)
    ctx = combined_context(vec_doc, lex, meta)
    return ctx.join(qtext, "query_id").select(
        "query_id", nokey_answer("query_text", "combined_context").alias("answer")
    )


_T5_ORACLE = """
SELECT doc_id,
       CASE WHEN length(text) > 200 THEN substr(text, 1, 200) || '...' ELSE text END AS text_preview
FROM documents
"""


@register("t5_preview", _T5_ORACLE)
def t5_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 (views.py:455): 200-char preview with ellipsis."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", preview("text").alias("text_preview"))


# Same candidate expression on both engines: short prefixes (len = id%8,
# some < 3 ⇒ invalid) and an over-long case every 11th doc.
_T6_CAND = (
    "CASE WHEN doc_id % 11 = 0 THEN repeat('x', 1200)"
    " ELSE substr(text, 1, CAST(doc_id % 8 AS INT)) END"
)

_T6_ORACLE = f"""
WITH cand AS (SELECT doc_id, {_T6_CAND} AS q FROM documents),
v AS (
    SELECT doc_id, q,
           length(regexp_replace(q, '{_STRIP_DUCK}', '', 'g')) BETWEEN 3 AND 1000 AS valid
    FROM cand
)
SELECT valid, count(*) AS n FROM v GROUP BY valid
"""


@register("t6_validate", _T6_ORACLE)
def t6_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 (views.py:119-131): 3..1000-char bound on the stripped text."""
    docs = load_table(spark, sf_dir, "documents")
    cand = docs.select("doc_id", F.expr(_T6_CAND).alias("q"))
    return (
        cand.withColumn("valid", is_valid_question("q"))
        .groupBy("valid")
        .agg(F.count("*").alias("n"))
    )


_T7_ORACLE = f"""
SELECT doc_id,
       '{TS_PREFIX}' || '_' ||
       regexp_replace(source || ' file#' || doc_id || '!.pdf',
                      '[^A-Za-z0-9._-]', '_', 'g') AS safe_name
FROM documents
"""


@register("t7_sanitize", _T7_ORACLE)
def t7_sanitize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7 (supabase_utils.py:145-147): filename sanitize + UTC-ts prefix."""
    docs = load_table(spark, sf_dir, "documents")
    dirty = F.concat(F.col("source"), F.lit(" file#"), F.col("doc_id").cast("string"), F.lit("!.pdf"))
    return docs.select("doc_id", sanitize_filename(dirty, TS_PREFIX).alias("safe_name"))
