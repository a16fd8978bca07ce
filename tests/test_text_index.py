"""Persisted inverted text index: search must be row-identical to the
in-memory bm25_rank operator, and the probe must reach the parquet scans as
partition filters on the term-hash buckets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from koby_s_ai_vector_db_spark.operators.corpus import bm25_rank
from koby_s_ai_vector_db_spark.queries.corpus_q import BM25_QUERIES
from koby_s_ai_vector_db_spark.sources.text_index import (
    build_text_index,
    search_text_index,
)
from koby_s_ai_vector_db_spark.sources.tables import load_table
from tests.conftest import SF_DIRS

SF_DIR = SF_DIRS["t2"]


def _queries(spark):
    return spark.createDataFrame(BM25_QUERIES, "query_id bigint, query_text string")


@pytest.fixture(scope="module")
def idx_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("textidx") / "index")
    docs = load_table(spark, SF_DIR, "documents")
    info = build_text_index(docs, path)
    assert info["n_docs"] == docs.count()
    assert info["n_terms"] > 0
    return path


@pytest.mark.parametrize("prune", ["static", "dynamic"])
@pytest.mark.parametrize("k", [10, 50])
def test_index_search_matches_inline_bm25(spark, idx_path, prune, k):
    # k=50 is hybrid_rrf's POOL depth: its BM25 arm reads the persisted
    # index while its oracle inlines bm25_rank, so a depth-11..50
    # divergence would surface only as an opaque hybrid_rrf parity
    # failure (ADVICE r10) — pin the equivalence at the depth relied on.
    idx = search_text_index(spark, idx_path, _queries(spark), k=k, prune=prune)
    inline = bm25_rank(
        load_table(spark, SF_DIR, "documents"), _queries(spark), k=k
    )
    assert sorted(map(tuple, idx.collect())) == sorted(map(tuple, inline.collect()))


def test_static_prune_reaches_partition_filters(spark, idx_path):
    """bucket IN (...) must land as PartitionFilters on the postings scan —
    unprobed buckets' files are never opened."""
    df = search_text_index(spark, idx_path, _queries(spark), k=10, prune="static")
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    pruned = [
        ln for ln in scans
        if "PartitionFilters" in ln and "bucket" in ln.split("PartitionFilters")[1]
        and "IN" in ln.split("PartitionFilters")[1].upper()
    ]
    assert pruned, plan


def test_bucket_count_read_from_sidecar(spark, tmp_path_factory):
    """n_buckets is part of the on-disk layout: search must use whatever
    the build wrote (here 16, not the default 64) — a mismatch would hash
    query terms into the wrong partitions and silently return nothing."""
    path = str(tmp_path_factory.mktemp("textidx16") / "index")
    docs = load_table(spark, SF_DIR, "documents")
    info = build_text_index(docs, path, n_buckets=16)
    assert info["n_buckets"] == 16
    idx = search_text_index(spark, path, _queries(spark), k=10)
    inline = bm25_rank(docs, _queries(spark), k=10)
    assert sorted(map(tuple, idx.collect())) == sorted(map(tuple, inline.collect()))


def test_incremental_append_equals_full_build(spark, tmp_path_factory):
    """Segment append must be EXACTLY equivalent to a one-shot build:
    every BM25 global (df, N, total length) is additive across segments,
    so build(half) + append(half) and build(full) return identical
    rankings and scores."""
    from pyspark.sql import functions as F

    from koby_s_ai_vector_db_spark.sources.text_index import append_to_text_index

    docs = load_table(spark, SF_DIR, "documents")
    incr = str(tmp_path_factory.mktemp("textidx") / "incr")
    full = str(tmp_path_factory.mktemp("textidx") / "full")
    build_text_index(docs.filter(F.col("doc_id") % 2 == 0), incr)
    app = append_to_text_index(docs.filter(F.col("doc_id") % 2 == 1), incr)
    assert app["n_appended"] == docs.filter("doc_id % 2 = 1").count()
    build_text_index(docs, full)
    a = search_text_index(spark, incr, _queries(spark), k=10)
    b = search_text_index(spark, full, _queries(spark), k=10)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_unindexed_terms_return_nothing(spark, idx_path):
    oov = spark.createDataFrame(
        [(9, "qqqz zzzq xyzzy")], "query_id bigint, query_text string"
    )
    assert search_text_index(spark, idx_path, oov, k=10).count() == 0


def test_compaction_preserves_search_and_merges_segments(spark, tmp_path_factory):
    """build(half) + append(half) + compact == build(full): identical
    search results, ONE stats row, one df row per (bucket, term), and
    fewer files per bucket partition than the segmented index."""
    import glob as _glob

    from koby_s_ai_vector_db_spark.sources.text_index import (
        append_to_text_index,
        compact_text_index,
    )

    path = str(tmp_path_factory.mktemp("textidx_compact") / "index")
    docs = load_table(spark, SF_DIR, "documents")
    build_text_index(docs.filter(F.col("doc_id") % 2 == 0), path, n_buckets=8)
    append_to_text_index(docs.filter(F.col("doc_id") % 2 == 1), path)

    before = search_text_index(spark, path, _queries(spark), k=10).collect()
    files_before = len(_glob.glob(f"{path}/postings/bucket=*/*.parquet"))

    info = compact_text_index(spark, path)
    assert info["n_segments_before"] == 2

    after = search_text_index(spark, path, _queries(spark), k=10)
    assert sorted(map(tuple, after.collect())) == sorted(map(tuple, before))
    # Full-build equivalence (the additive-globals invariant, post-merge).
    inline = bm25_rank(docs, _queries(spark), k=10)
    assert sorted(map(tuple, after.collect())) == sorted(map(tuple, inline.collect()))

    import pyspark.sql.functions as SF

    stats = spark.read.parquet(f"{path}/stats")
    assert stats.count() == 1
    terms = spark.read.parquet(f"{path}/terms")
    assert terms.groupBy("bucket", "term").count().filter("count > 1").count() == 0
    files_after = len(_glob.glob(f"{path}/postings/bucket=*/*.parquet"))
    assert files_after <= files_before
