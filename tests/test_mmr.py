"""MMR rerank (operators/rerank.py): diversity semantics on constructed
vectors, degenerate arguments, and Python-reference parity on the fixture."""

from __future__ import annotations

import math

import pytest

from koby_s_ai_vector_db_spark.operators.rerank import (
    LAM_DEN,
    LAM_NUM,
    QSCALE,
    mmr_rerank,
)
from tests.conftest import SF_DIRS


def _run(spark, corpus, queries, **kw):
    cdf = spark.createDataFrame(corpus, "vec_id long, embedding array<float>")
    qdf = spark.createDataFrame(queries, "query_id long, query_vec array<float>")
    out = mmr_rerank(cdf, qdf, **kw)
    return [(r.query_id, r.vec_id, r.rank) for r in out.collect()]


def test_diversity_beats_pure_relevance(spark):
    """Candidate 11 is nearly identical to the top pick 10; MMR must skip
    it in favor of the less-relevant-but-diverse 12 at rank 2.

    With lam=0.7: score(11) = .7*.85 - .3*sim(11,10)=.9946 -> .2966;
    score(12) = .7*.6 - .3*sim(12,10)=.322 -> .3234 — 12 wins despite a
    0.25 relevance deficit. (Note the query must NOT coincide with the
    top pick: when q == pick1, rel(d) == sim(d, pick1) for every d and
    MMR degenerates to pure relevance for any lam.)"""
    corpus = [
        (10, [0.9, 0.43589, 0.0]),
        (11, [0.85, 0.5268, 0.0]),    # rel .85, sim to 10 ~.9946
        (12, [0.6, -0.5, 0.6245]),    # rel .60, sim to 10 ~.322
    ]
    queries = [(0, [1.0, 0.0, 0.0])]
    got = _run(spark, corpus, queries, n_shortlist=3, k=3)
    assert got == [(0, 10, 1), (0, 12, 2), (0, 11, 3)]


def test_pure_relevance_when_all_diverse(spark):
    corpus = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
    ]
    queries = [(0, [0.9, 0.5, 0.1, 0.0])]
    got = _run(spark, corpus, queries, n_shortlist=3, k=3)
    assert got == [(0, 1, 1), (0, 2, 2), (0, 3, 3)]


def test_k_capped_by_candidates(spark):
    corpus = [(1, [1.0, 0.0]), (2, [0.0, 1.0])]
    queries = [(0, [1.0, 0.0])]
    got = _run(spark, corpus, queries, n_shortlist=5, k=5)
    assert [r[2] for r in got] == [1, 2]


def test_invalid_k_raises(spark):
    with pytest.raises(ValueError):
        _run(spark, [(1, [1.0])], [(0, [1.0])], n_shortlist=5, k=6)
    with pytest.raises(ValueError):
        _run(spark, [(1, [1.0])], [(0, [1.0])], n_shortlist=5, k=0)


def _python_mmr(corpus, qv, n_short, k):
    """Independent integer-exact reference (mirrors the documented
    semantics, not the implementation)."""

    def norm_q(v):
        n = math.sqrt(sum(x * x for x in v)) or 1e-10
        return [round(x / n * QSCALE) for x in v]

    qq = norm_q(qv)
    cand = sorted(
        ((sum(a * b for a, b in zip(norm_q(v), qq)), i, norm_q(v)) for i, v in corpus),
        key=lambda t: (-t[0], t[1]),
    )[:n_short]
    sel: list[tuple] = []
    pool = list(cand)
    while pool and len(sel) < k:
        if not sel:
            best = max(pool, key=lambda t: (t[0], -t[1]))
        else:
            def score(t):
                mx = max(sum(a * b for a, b in zip(t[2], s[2])) for s in sel)
                return LAM_NUM * t[0] - (LAM_DEN - LAM_NUM) * mx

            best = max(pool, key=lambda t: (score(t), -t[1]))
        sel.append(best)
        pool.remove(best)
    return [(i, rank + 1) for rank, (_, i, _) in enumerate(sel)]


def test_matches_python_reference_on_fixture(spark):
    emb = spark.read.parquet(SF_DIRS["t1"] + "/embeddings.parquet")
    rows = [(r.vec_id, list(r.embedding)) for r in emb.collect()]
    from pyspark.sql import functions as F

    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = mmr_rerank(emb, queries, n_shortlist=15, k=8)
    got = {(r.query_id, r.vec_id, r.rank) for r in out.collect()}
    want = set()
    by_id = dict(rows)
    for qid in range(3):
        qv = [float(x) for x in by_id[qid]]
        corpus = [(i, [float(x) for x in v]) for i, v in rows]
        for vid, rank in _python_mmr(corpus, qv, 15, 8):
            want.add((qid, vid, rank))
    assert got == want
