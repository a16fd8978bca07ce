"""Product-quantization (PQ) ANN: compressed-code scan + exact re-rank.

The reference's approximate tier is pgvector ivfflat (supabase_schema.sql:
137-139) — coarse cells that prune WHICH vectors are scanned. PQ is the
complementary compression axis used by FAISS's IndexIVFPQ (the production
successor of the reference's IndexFlatIP, core/utils.py:203-214): it
shrinks WHAT is scanned. Each dim-64 vector is split into M=8 subvectors
of 8 dims; every subvector is quantized to the id of its nearest centroid
in a 16-entry per-subspace codebook. A vector becomes 8 code ids — 4 bits
each, 4 bytes total vs 256 bytes of float32 — a 64x smaller scan.

Search is the classic ADC (asymmetric distance computation) two-phase:

  1. per query, precompute a distance TABLE dtab[s][c] = <q_sub_s, cb[s][c]>
     (M*KS = 128 dots of dim 8 — once per query, not per corpus row);
  2. scan ONLY (vec_id, codes): approx sim = sum_s dtab[s][codes[s]] —
     8 lookups + 8 adds per row against a broadcast table;
  3. take a per-query shortlist by approx sim (WindowGroupLimit truncates
     map-side, so the shuffle is |queries| x shortlist rows);
  4. fetch full vectors for the shortlist only (broadcast semi-join back
     to the corpus — at scale this is the "fetch from storage" step) and
     re-rank exactly; top-k of the exact scores is the answer.

At 100 TB the economics: the hot loop reads 4-byte codes instead of
256-byte vectors (memory-bandwidth-bound scan -> 64x fewer bytes), and the
full-precision table is touched only for |queries| x shortlist rows.
Recall is governed by shortlist size and codebook quality; the exact
re-rank means PRECISION of returned scores is always exact.

Cross-engine oracle strategy: codebooks are Rademacher (+/-1) centroids
derived from the portable md5 hash (functions/hashing.py) — constants, not
an RNG — embedded as literals in both the Spark plan and the DuckDB oracle
SQL. +/-1.0 literals are exact in every dialect, all centroids share norm
sqrt(8) so nearest-centroid == argmax-dot, and both engines fold dots in
index order (the same bit-exactness contract the hyperplane-LSH sketch in
operators/dedup.py relies on). Ties everywhere break to the lower index /
lower vec_id, so results are value-identical across engines.

A learned codebook (k-means per subspace, like faiss.ProductQuantizer
training) drops quantization error further but is engine-specific float
iteration — same trade-off as kmeans_ivf_topk, which is recall-tested
rather than value-oracled. The PQ MECHANICS here are identical either way.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from koby_s_ai_vector_db_spark.functions.partitioning import spread
from koby_s_ai_vector_db_spark.functions.vectors import dot, l2_normalize

DIM = 64  # fixture embedding dimensionality
M = 8  # subspaces
SUB = DIM // M  # dims per subspace
KS = 16  # codes per subspace (4-bit codes)


def _md5_u32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def pq_codebook() -> list[list[list[float]]]:
    """[M][KS][SUB] Rademacher centroids: entry = +1.0 if md5 even else -1.0.

    Deterministic constants — both engines receive them as literals, so the
    codebook needs no cross-engine arithmetic at all. With 16 draws from
    256 sign patterns a subspace may contain duplicate centroids (birthday
    ~37%); argmax ties break to the lower code id on both engines, so
    duplicates only waste a code, never break parity.
    """
    return [
        [
            [
                1.0 if _md5_u32(f"pq:{s}:{c}:{i}") % 2 == 0 else -1.0
                for i in range(SUB)
            ]
            for c in range(KS)
        ]
        for s in range(M)
    ]


def codebook_df(spark) -> DataFrame:
    """The codebook as a 1-row DataFrame — the index's shipped artifact.

    Shipped as DATA (createDataFrame -> broadcast join), never as a SQL
    literal: a 1024-double nested-array literal embedded in an expression
    makes whole-stage codegen emit (and Janino recompile, erratically
    cache-missing) a multi-second giant method — measured 0.4s vs 2-3s per
    run on the same 2k-row scan. It is also the honest 100 TB shape: FAISS
    ships trained codebooks to workers as broadcast state, not as query
    text."""
    return spark.createDataFrame(
        [(pq_codebook(),)], "cb array<array<array<double>>>"
    )


def cb_literal_duckdb() -> str:
    """The same codebook as a DuckDB DOUBLE[][][] literal (for oracle SQL)."""
    cb = pq_codebook()
    body = (
        "["
        + ", ".join(
            "["
            + ", ".join(
                "[" + ", ".join(f"{x:.1f}" for x in code) + "]" for code in sub
            )
            + "]"
            for sub in cb
        )
        + "]"
    )
    return f"CAST({body} AS DOUBLE[][][])"


# pq_encode reads its input vector M*KS*SUB = 1024 times per row; without
# the bind, CollapseProject inlined `l2_normalize(embedding)` into every
# read (~500M interpreted evals at a 2k-row scale factor — the 70s
# q2_ann_pq regression in BENCH_r03). See functions/exprs.py.
from koby_s_ai_vector_db_spark.functions.exprs import bind_once as _bind_once


def pq_encode(vec_col: str = "v", cb_col: str = "cb") -> F.Column:
    """Map-side encode: array of M code ids (1-based), codes[s] = argmax_c
    <v_sub_s, cb[s][c]>. One expression, zero shuffles (the codebook column
    comes from a 1-row broadcast, see codebook_df) — the PQ analogue of the
    hyperplane sign-mask sketch (operators/dedup.py)."""
    # dots[s] = 16 subspace dots; codes[s] = first index of the max.
    body = (
        f"transform("
        f"  transform({cb_col}, (cbs, s) ->"
        f"    transform(cbs, c ->"
        f"      aggregate(sequence(0, {SUB - 1}), CAST(0.0 AS DOUBLE),"
        f"        (a, i) -> a + element_at(c, i + 1)"
        f"                    * element_at(nv, s * {SUB} + i + 1)))),"
        f"  ds -> CAST(array_position(ds, array_max(ds)) AS INT))"
    )
    return F.expr(_bind_once(vec_col, body))


def pq_distance_table(query_vec_col: str = "qv", cb_col: str = "cb") -> F.Column:
    """Per-query ADC table: dtab[s][c] = <q_sub_s, cb[s][c]> — computed once
    per query row (the small broadcast side), never per corpus row."""
    body = (
        f"transform({cb_col}, (cbs, s) ->"
        f"  transform(cbs, c ->"
        f"    aggregate(sequence(0, {SUB - 1}), CAST(0.0 AS DOUBLE),"
        f"      (a, i) -> a + element_at(c, i + 1)"
        f"                  * element_at(nv, s * {SUB} + i + 1))))"
    )
    return F.expr(_bind_once(query_vec_col, body))


def pq_adc_score(codes_col: str = "codes", dtab_col: str = "dtab") -> F.Column:
    """approx sim = sum_s dtab[s][codes[s]] — 8 lookups + 8 adds per row."""
    return F.expr(
        f"aggregate(sequence(0, {M - 1}), CAST(0.0 AS DOUBLE),"
        f"  (a, s) -> a + element_at(element_at({dtab_col}, s + 1),"
        f"                           element_at({codes_col}, s + 1)))"
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    shortlist: int = 64,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    query_vec_col: str = "query_vec",
    round_to: int | None = 6,
    cache_key=None,
) -> DataFrame:
    """PQ ANN: compressed-code scan -> ADC shortlist -> exact re-rank.

    Returns (query_id, corpus_id, sim, rank) with EXACT cosine scores
    (re-ranked), rank in 1..k. Recall vs exact top-k is measured in
    tests/test_ann_recall.py; it rises monotonically with `shortlist`.

    `cache_key` memo-persists the encoded (id, codes) subtree per session
    (same convention as the minhash shingle table): the encode — 1024
    codebook reads per corpus row — then runs once per session instead of
    once per call. The durable form of the same idea is
    sources/pq_index.py, which persists the codes to parquet."""
    from koby_s_ai_vector_db_spark.functions.caching import memo_persist

    c = spread(corpus).select(
        F.col(corpus_id), l2_normalize(vec_col).alias("v")
    )
    cbdf = codebook_df(corpus.sparkSession)

    # The compressed index: at scale this projection is what you PERSIST
    # (sources/pq_index.py does exactly that); the ADC scan then never
    # touches the float arrays.
    def _codes():
        return c.join(F.broadcast(cbdf)).select(
            corpus_id, pq_encode("v").alias("codes")
        )

    codes = (
        memo_persist(corpus.sparkSession, ("pq_codes", cache_key), _codes)
        if cache_key is not None
        else _codes()
    )

    q = queries.select(
        F.col(query_id), l2_normalize(query_vec_col).alias("qv")
    )
    dtab = q.join(F.broadcast(cbdf)).select(
        query_id, pq_distance_table("qv").alias("dtab")
    )

    w_sl = Window.partitionBy(query_id).orderBy(
        F.desc("adc"), F.asc(corpus_id)
    )
    sl = (
        codes.join(F.broadcast(dtab))
        .withColumn("adc", pq_adc_score())
        .withColumn("srank", F.row_number().over(w_sl))
        .filter(F.col("srank") <= shortlist)
        .select(query_id, corpus_id)
    )

    # Fetch + exact re-rank: only |queries| x shortlist vectors leave the
    # compressed domain.
    rer = (
        F.broadcast(sl)
        .join(c, corpus_id)
        .join(F.broadcast(q), query_id)
        .withColumn("sim", dot("v", "qv"))
    )
    w_k = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.asc(corpus_id))
    sim = F.round("sim", round_to) if round_to is not None else F.col("sim")
    return (
        rer.withColumn("rank", F.row_number().over(w_k))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, sim.alias("sim"), "rank")
    )
