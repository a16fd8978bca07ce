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
each shard's tail holds exactly seq_len tokens (proven in
tests/test_packed_shards.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

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
    array<string>, doc_ids array<long> in stream order, n_docs int,
    shard int[partition])."""
    seqs = _assemble_sequences(docs, seq_len, n_shards, seed, id_col, text_col)
    seqs.repartition("shard").write.mode("overwrite").partitionBy(
        "shard"
    ).parquet(f"{path}/{DATA_SUBDIR}")
    return docs.sparkSession.read.parquet(f"{path}/{DATA_SUBDIR}").count()


def _assemble_sequences(
    docs: DataFrame,
    seq_len: int,
    n_shards: int,
    seed: int,
    id_col: str,
    text_col: str,
) -> DataFrame:
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
            "doc_id",
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
    # doc_ids ride along in the same order: per-sequence provenance for
    # attribution audits (e.g. tracing a contaminated sequence back to
    # its source documents) without re-deriving the assignment table.
    sorted_contrib = F.array_sort(
        F.collect_list(F.struct("doc_offset", "doc_id", "_toks"))
    )
    seqs = contrib.groupBy("shard", "seq_id").agg(
        F.flatten(
            F.transform(sorted_contrib, lambda s: s["_toks"])
        ).alias("tokens"),
        F.transform(sorted_contrib, lambda s: s["doc_id"]).alias("doc_ids"),
        F.count("*").cast("int").alias("n_docs"),
    )
    return seqs


def append_to_packed_shards(
    docs: DataFrame,
    path: str,
    seq_len: int,
    n_shards: int,
    seed: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> int:
    """Absorb a new document batch into an existing packed artifact —
    the incremental form of `build_packed_shards`, mirroring
    `append_to_ivfpq_index` / `append_to_text_index` (segment-style
    append, no wholesale re-pack).

    The batch is packed independently and its sequences are numbered
    from each shard's current max(seq_id) + 1, so existing sequence
    files are never rewritten (parquet append touches only the shard
    partitions the batch lands in). Consequently each shard's previous
    TAIL sequence stays partial — append creates a new boundary instead
    of backfilling, exactly like a segment write; a `build_packed_shards`
    re-pack is the compaction. Shard assignment uses the same hash, so a
    doc appends into the shard the full rebuild would give it. Returns
    the number of sequences appended.
    """
    spark = docs.sparkSession
    # Materialize the per-shard bases up front (<= n_shards tiny rows):
    # the append write must not lazily re-scan the very path it appends
    # to, and the collected rows pin the pre-append state. A missing
    # artifact means this is the first batch — base 0 everywhere, so a
    # stream can bootstrap a fresh path without a prior build.
    try:
        base_rows = (
            spark.read.parquet(f"{path}/{DATA_SUBDIR}")
            .groupBy("shard")
            .agg((F.max("seq_id") + 1).alias("_base"))
            .collect()
        )
    except AnalysisException:
        base_rows = []
    base = spark.createDataFrame(
        [(r.shard, r._base) for r in base_rows] or [(None, None)],
        "shard int, _base bigint",
    )
    batch = _assemble_sequences(docs, seq_len, n_shards, seed, id_col, text_col)
    shifted = (
        batch.join(F.broadcast(base), "shard", "left")
        .withColumn(
            "seq_id", F.col("seq_id") + F.coalesce("_base", F.lit(0))
        )
        .drop("_base")
    )
    # persist: count + write otherwise run the whole pack twice — per
    # micro-batch, in the streaming path.
    shifted.persist()
    try:
        n = shifted.count()
        shifted.repartition("shard").write.mode("append").partitionBy(
            "shard"
        ).parquet(f"{path}/{DATA_SUBDIR}")
    finally:
        shifted.unpersist()
    return n


def read_packed_shards(
    spark: SparkSession, path: str, shards: list[int] | None = None
) -> DataFrame:
    """Read the packed artifact; a shard subset lands as parquet
    PartitionFilters so unselected shard directories are never opened."""
    df = spark.read.parquet(f"{path}/{DATA_SUBDIR}")
    if shards is not None:
        df = df.filter(F.col("shard").isin([int(s) for s in shards]))
    return df
