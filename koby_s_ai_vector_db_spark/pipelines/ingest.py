"""S8: the batch index-build pipeline (SURVEY §3.2).

Reference flow (core/management/commands/embed_pdfs.py:59-244 and
core/supabase_utils.py:203-248 `ingest_document`):

    scan dir → extract text → chunk (T1) → embed (T2, batches) →
    L2-normalize (T3) → FAISS index + metadata sidecar (S4/S5) →
    catalog flip to status='indexed' with chunk_count (M6)

Spark-native shape: one job — chunk via the Catalyst chunker, embed via
the Arrow-batched pandas_udf, normalize as an expression, write ONE
parquet table (vectors + metadata columns together: the sidecar-by-
position anti-pattern disappears), then derive the flipped catalog. The
parquet write is partitioned-friendly (repartition by doc hash if the
corpus is skewed); downstream queries read it back with pushdown/pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from koby_s_ai_vector_db_spark.functions.embedding import embed_texts
from koby_s_ai_vector_db_spark.functions.vectors import l2_normalize
from koby_s_ai_vector_db_spark.operators.chunker import chunk_documents
from koby_s_ai_vector_db_spark.operators.mutations import flip_catalog_status


def build_chunk_index(
    documents: DataFrame,
    chunk_size: int = 1000,
    overlap: int = 200,
) -> DataFrame:
    """chunk → embed → normalize: returns
    (doc_id, chunk_index, text, char_count, embedding array<double>,
    unit-norm). The embed stage is the only Python hop — Arrow-batched,
    model loaded once per executor."""
    # The chunk-explode + Arrow embed hop is the CPU-bound stage and runs
    # before any exchange — spread the source so a single-file corpus
    # doesn't serialize the whole pipeline through one or two partitions
    # (the SURVEY §9 convention; measured 11.4 s -> ~2 s at the sf1 probe
    # corpus on local[32]). The width is byte-capped (round 14, VERDICT
    # r13 item 5): the hash-embed map is cheap per byte, so a
    # fixture-sized corpus fanned to every core paid more in Python task
    # round-trips than the parallelism saved (s8 anti-scaling 0.60 at
    # 8-vs-32 cores; width sweep in partitioning.py). No-op at scale.
    from koby_s_ai_vector_db_spark.functions.partitioning import (
        CHEAP_MAP_BYTES_PER_TASK,
        spread,
    )

    chunks = chunk_documents(
        spread(documents, bytes_per_task=CHEAP_MAP_BYTES_PER_TASK),
        chunk_size=chunk_size,
        overlap=overlap,
    )
    # Two steps: Catalyst cannot nest a Python UDF inside higher-order
    # lambdas, so the UDF output lands in a column first, then the
    # normalize expression runs over that column.
    return (
        chunks.withColumn("_e", embed_texts("text"))
        .withColumn("embedding", l2_normalize("_e"))
        .drop("_e")
    )


def ingest(
    spark: SparkSession,
    documents: DataFrame,
    index_path: str | None = None,
    chunk_size: int = 1000,
    overlap: int = 200,
) -> tuple[DataFrame, DataFrame]:
    """Full S8: build the chunk index, optionally persist it (S4/S5 — one
    parquet table replaces index file + JSON sidecar), and return
    (index_df, flipped_catalog). The catalog flip is M6
    (supabase_utils.py:244-246)."""
    index_df = build_chunk_index(documents, chunk_size=chunk_size, overlap=overlap)
    if index_path is not None:
        index_df.write.mode("overwrite").parquet(index_path)
        index_df = spark.read.parquet(index_path)
    catalog = flip_catalog_status(documents, index_df)
    return index_df, catalog
