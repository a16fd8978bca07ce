"""S8 end-to-end: chunk → embed → normalize → parquet write → read-back →
catalog flip (the reference's embed_pdfs build + ingest_document,
core/management/commands/embed_pdfs.py:59-244, supabase_utils.py:203-248)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from koby_s_ai_vector_db_spark.pipelines.ingest import ingest
from koby_s_ai_vector_db_spark.sources.tables import load_table
from tests.conftest import SF_DIRS


def test_ingest_roundtrip(spark, tmp_path):
    docs = load_table(spark, SF_DIRS["t1"], "documents")
    index_path = str(tmp_path / "chunk_index")
    index, catalog = ingest(spark, docs, index_path=index_path, chunk_size=100, overlap=20)

    # S4/S5: one parquet table carries vectors + metadata together.
    assert set(index.columns) == {"doc_id", "chunk_index", "text", "char_count", "embedding"}
    n_chunks = index.count()
    assert n_chunks > 0

    # T3 ran over the T2 output: unit norms.
    norms = index.select(
        F.sqrt(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x)).alias("n")
    ).collect()
    assert all(math.isclose(r.n, 1.0, rel_tol=1e-9) for r in norms)

    # M6: every chunked doc flips to indexed with the right count.
    cat = {r.doc_id: r for r in catalog.collect()}
    per_doc = {r.doc_id: r.n for r in index.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    for doc_id, n in per_doc.items():
        assert cat[doc_id].status == "indexed"
        assert cat[doc_id].chunk_count == n
    assert sum(per_doc.values()) == n_chunks


def test_ingested_index_is_searchable(spark, tmp_path):
    """The persisted index answers Q1 directly — the reference reloads
    FAISS from disk per query (utils.py:203-204); here it's one scan."""
    from koby_s_ai_vector_db_spark.operators.similarity import topk_cosine

    docs = load_table(spark, SF_DIRS["t1"], "documents").limit(50)
    index_path = str(tmp_path / "idx")
    index, _ = ingest(spark, docs, index_path=index_path, chunk_size=100, overlap=20)
    corpus = index.select(
        F.concat_ws("_", "doc_id", "chunk_index").alias("vec_id"), "embedding"
    )
    queries = corpus.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    hits = topk_cosine(corpus, queries, k=3, threshold=0.0, pre_normalized=True)
    rows = hits.collect()
    assert len(rows) > 0
    # self-match at rank 1 with sim ≈ 1
    top = {r.query_id: r for r in rows if r.rank == 1}
    for qid, r in top.items():
        assert r.vec_id == qid and abs(r.sim - 1.0) < 1e-6
