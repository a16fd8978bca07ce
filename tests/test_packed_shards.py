"""Persisted packed-shard artifact: round-trip fidelity, fullness, and
shard partition pruning (sources/packed.py)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from koby_s_ai_vector_db_spark.operators.packing import pack_sequences
from koby_s_ai_vector_db_spark.sources.packed import (
    build_packed_shards,
    read_packed_shards,
)

SEQ_LEN = 5
N_SHARDS = 2
SEED = 3


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (i, " ".join(f"d{i}w{j}" for j in range(1 + (i * 3) % 8)))
        for i in range(25)
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


@pytest.fixture(scope="module")
def built(spark, corpus):
    scratch = tempfile.mkdtemp(prefix="koby_packed_")
    n = build_packed_shards(
        corpus, scratch, seq_len=SEQ_LEN, n_shards=N_SHARDS, seed=SEED
    )
    yield scratch, n
    shutil.rmtree(scratch, ignore_errors=True)


def test_fullness_and_conservation(spark, corpus, built):
    path, n_seqs = built
    seqs = read_packed_shards(spark, path)
    assert seqs.count() == n_seqs
    total = corpus.select(
        F.sum(F.size(F.split("text", r"\s+"))).alias("s")
    ).collect()[0].s
    rows = seqs.select("shard", "seq_id", F.size("tokens").alias("n")).collect()
    assert sum(r.n for r in rows) == total
    last = {}
    for r in rows:
        last[r.shard] = max(last.get(r.shard, -1), r.seq_id)
    for r in rows:
        if r.seq_id < last[r.shard]:
            assert r.n == SEQ_LEN, (r.shard, r.seq_id, r.n)
        else:
            assert 0 < r.n <= SEQ_LEN


def test_stream_order_round_trip(spark, corpus, built):
    """Concatenating a shard's sequences in seq_id order reproduces the
    shard's doc_id-ordered token stream exactly — tokens are unique per
    doc here, so equality is a strong ordering check."""
    path, _ = built
    assign = pack_sequences(
        corpus, seq_len=SEQ_LEN, n_shards=N_SHARDS, seed=SEED
    )
    shard_docs = {
        r.doc_id: r.shard for r in assign.select("doc_id", "shard").distinct().collect()
    }
    words = {
        r.doc_id: [w for w in r.text.split() if w]
        for r in corpus.collect()
    }
    expected = {}
    for d in sorted(words):
        if d in shard_docs:
            expected.setdefault(shard_docs[d], []).extend(words[d])
    got = {}
    for r in sorted(
        read_packed_shards(spark, path).collect(),
        key=lambda r: (r.shard, r.seq_id),
    ):
        got.setdefault(r.shard, []).extend(r.tokens)
    assert got == expected


def test_n_docs_matches_assignments(spark, corpus, built):
    path, _ = built
    assign = pack_sequences(corpus, seq_len=SEQ_LEN, n_shards=N_SHARDS, seed=SEED)
    exp = {
        (r.shard, r.seq_id): r.n
        for r in assign.groupBy("shard", "seq_id").agg(F.count("*").alias("n")).collect()
    }
    got = {
        (r.shard, r.seq_id): r.n_docs
        for r in read_packed_shards(spark, path).collect()
    }
    assert got == exp


def test_shard_subset_prunes_partitions(spark, built):
    path, _ = built
    df = read_packed_shards(spark, path, shards=[0])
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert scan and "PartitionFilters" in scan[0] and "shard" in scan[0].split(
        "PartitionFilters"
    )[1], scan
    assert {r.shard for r in df.collect()} == {0}


def test_append_segment_semantics(spark, corpus):
    """build(half1) + append(half2): no seq_id collisions, conservation,
    and every appended doc lands in the shard a full rebuild gives it.
    The pre-append tail stays partial (segment boundary, documented)."""
    from koby_s_ai_vector_db_spark.sources.packed import (
        append_to_packed_shards,
    )

    half1 = corpus.filter("doc_id < 13")
    half2 = corpus.filter("doc_id >= 13")
    scratch = tempfile.mkdtemp(prefix="koby_packed_app_")
    try:
        n1 = build_packed_shards(
            half1, scratch, seq_len=SEQ_LEN, n_shards=N_SHARDS, seed=SEED
        )
        n2 = append_to_packed_shards(
            half2, scratch, seq_len=SEQ_LEN, n_shards=N_SHARDS, seed=SEED
        )
        seqs = read_packed_shards(spark, scratch).collect()
        assert len(seqs) == n1 + n2
        keys = [(r.shard, r.seq_id) for r in seqs]
        assert len(keys) == len(set(keys)), "seq_id collision after append"
        total = corpus.select(
            F.sum(F.size(F.split("text", r"\s+"))).alias("s")
        ).collect()[0].s
        assert sum(len(r.tokens) for r in seqs) == total
        # Shard placement matches the full rebuild (same portable hash).
        full_assign = pack_sequences(
            corpus, seq_len=SEQ_LEN, n_shards=N_SHARDS, seed=SEED
        )
        expected_shards = {
            r.doc_id: r.shard
            for r in full_assign.select("doc_id", "shard").distinct().collect()
        }
        app_assign = pack_sequences(
            half2, seq_len=SEQ_LEN, n_shards=N_SHARDS, seed=SEED
        )
        for r in app_assign.select("doc_id", "shard").distinct().collect():
            assert expected_shards[r.doc_id] == r.shard
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def test_doc_ids_provenance(spark, corpus, built):
    """Every sequence carries its source doc ids in stream order —
    matching the assignment table's docs for that sequence, ordered by
    doc_offset."""
    path, _ = built
    assign = pack_sequences(corpus, seq_len=SEQ_LEN, n_shards=N_SHARDS, seed=SEED)
    exp = {}
    for r in sorted(
        assign.collect(), key=lambda r: (r.shard, r.seq_id, r.doc_offset)
    ):
        exp.setdefault((r.shard, r.seq_id), []).append(r.doc_id)
    got = {
        (r.shard, r.seq_id): list(r.doc_ids)
        for r in read_packed_shards(spark, path).collect()
    }
    assert got == exp


def test_append_bootstraps_fresh_path(spark, corpus):
    """First append against a never-built path starts every shard at
    seq_id 0 — a stream can bootstrap without a prior build."""
    from koby_s_ai_vector_db_spark.sources.packed import (
        append_to_packed_shards,
    )

    scratch = tempfile.mkdtemp(prefix="koby_packed_boot_")
    try:
        n = append_to_packed_shards(
            corpus, scratch, seq_len=SEQ_LEN, n_shards=N_SHARDS, seed=SEED
        )
        built = build_packed_shards(
            corpus, scratch + "_ref", seq_len=SEQ_LEN, n_shards=N_SHARDS, seed=SEED
        )
        assert n == built
        rows = read_packed_shards(spark, scratch).collect()
        assert min(r.seq_id for r in rows) == 0
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
        shutil.rmtree(scratch + "_ref", ignore_errors=True)
