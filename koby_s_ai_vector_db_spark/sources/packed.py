"""Persisted packed-shard artifact: the materialized form of
`operators/packing.pack_sequences` — what a pretraining job actually
reads.

  build (once)    assign docs to sequences (pack_sequences), slice each
                  doc's token contribution, assemble every sequence's
                  token array in stream order; write parquet
                  partitionBy(shard).
  read (steady)   plain parquet scan; a shard subset prunes partitions
                  (PartitionFilters), so N training workers each open
                  only their own shard directories — no job-level
                  shuffling of another worker's data.

Same build-once economics as the persisted ANN/text indexes
(sources/pq_index.py, sources/text_index.py). The reference has no
analogue (it stops at retrieval); this completes the corpus→trainer
handoff of the training-data tier.

Scale shape: the only exchange beyond pack_sequences' per-shard offset
window is the (shard, seq_id) assembly groupBy — key cardinality is the
number of output sequences, values are bounded at seq_len tokens, and
the write is already partitioned by its read key. Every sequence except
each shard's tail holds exactly seq_len tokens (asserted at build).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from koby_s_ai_vector_db_spark.operators.dedup import words_expr
from koby_s_ai_vector_db_spark.operators.packing import pack_sequences

DATA_SUBDIR = "sequences"


def build_packed_shards(
    docs: DataFrame,
    path: str,
    seq_len: int,
    n_shards: int,
    seed: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> int:
    """Materialize the packed corpus under ``path``; returns the number
    of sequences written. Output schema: (seq_id long, tokens
    array<string>, n_docs int, shard int[partition])."""
    assign = pack_sequences(
        docs, seq_len=seq_len, n_shards=n_shards, seed=seed,
        id_col=id_col, text_col=text_col,
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"), words_expr(text_col).alias("_w")
    )
    # Each assignment row covers the doc's token range
    # [max(off, seq*L) - off + 1, +n_tokens] — slice it out, then
    # assemble per sequence in stream (doc_offset) order.
    L = F.lit(seq_len)
    contrib = (
        assign.join(toks, "doc_id")
        .select(
            "shard",
            "seq_id",
            "doc_offset",
            F.slice(
                "_w",
                (
                    F.greatest("doc_offset", F.col("seq_id") * L)
                    - F.col("doc_offset")
                    + 1
                ).cast("int"),
                F.col("n_tokens").cast("int"),
            ).alias("_toks"),
        )
    )
    # collect_list is unordered across tasks; array_sort on
    # struct(doc_offset, ...) restores stream order (offsets are unique —
    # each doc appears once per sequence and offsets strictly increase).
    seqs = contrib.groupBy("shard", "seq_id").agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_offset", "_toks"))),
                lambda s: s["_toks"],
            )
        ).alias("tokens"),
        F.count("*").cast("int").alias("n_docs"),
    )
    seqs.repartition("shard").write.mode("overwrite").partitionBy(
        "shard"
    ).parquet(f"{path}/{DATA_SUBDIR}")
    return docs.sparkSession.read.parquet(f"{path}/{DATA_SUBDIR}").count()


def read_packed_shards(
    spark: SparkSession, path: str, shards: list[int] | None = None
) -> DataFrame:
    """Read the packed artifact; a shard subset lands as parquet
    PartitionFilters so unselected shard directories are never opened."""
    df = spark.read.parquet(f"{path}/{DATA_SUBDIR}")
    if shards is not None:
        df = df.filter(F.col("shard").isin([int(s) for s in shards]))
    return df
