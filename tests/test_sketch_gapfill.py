"""Unit tests for operators/sketches.py (portable HLL) and
operators/gapfill.py (dense spine + LOCF + linear interpolation) on
constructed inputs with hand-computable answers."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from koby_s_ai_vector_db_spark.operators.gapfill import gapfill
from koby_s_ai_vector_db_spark.operators.sketches import (
    M,
    hll_estimate,
    hll_registers,
)


def test_hll_accuracy_on_planted_cardinality(spark):
    # 5000 distinct keys; HLL sigma at m=1024 is ~3.3%, so 15% is a
    # generous, flake-free bound.
    df = spark.range(5000).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("k")
    )
    est = hll_estimate(
        hll_registers(df, F.col("k"), ["g"]), ["g"]
    ).collect()[0]
    assert abs(est.est_distinct - 5000) / 5000 < 0.15
    assert est.n_registers_hit <= M


def test_hll_duplicates_do_not_inflate(spark):
    # 100 distinct keys, each repeated 50x -> registers identical to the
    # distinct set (max is idempotent), estimate near 100.
    once = spark.range(100).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("k")
    )
    many = spark.range(5000).select(
        F.lit("g").alias("g"), (F.col("id") % 100).cast("string").alias("k")
    )
    r1 = {(r.bucket, r.r) for r in hll_registers(once, F.col("k"), ["g"]).collect()}
    r2 = {(r.bucket, r.r) for r in hll_registers(many, F.col("k"), ["g"]).collect()}
    assert r1 == r2
    est = hll_estimate(hll_registers(many, F.col("k"), ["g"]), ["g"]).collect()[0]
    assert abs(est.est_distinct - 100) / 100 < 0.15


def test_hll_registers_merge_is_union(spark):
    # The sketch is mergeable: max-merging the register tables of two
    # disjoint halves equals the register table of the union.
    a = spark.range(0, 1000).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("k")
    )
    b = spark.range(1000, 2000).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("k")
    )
    merged = (
        hll_registers(a, F.col("k"), ["g"])
        .unionByName(hll_registers(b, F.col("k"), ["g"]))
        .groupBy("g", "bucket")
        .agg(F.max("r").alias("r"))
    )
    union = hll_registers(a.unionByName(b), F.col("k"), ["g"])
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in union.collect()
    }


def _ts(h: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, h, 30)  # mid-hour observation


def test_gapfill_locf_and_interpolation(spark):
    # Series s: observations at hours 0 (v=10) and 3 (v=40); hours 1-2
    # are gaps. Buckets are on the hour, observations mid-hour, so the
    # interpolation x-axis runs on BUCKET epochs: hour1 = 10 + 30*(1/3)
    # = 20, hour2 = 30.
    df = spark.createDataFrame(
        [("s", _ts(0), 10.0), ("s", _ts(3), 40.0)], ["series", "ts", "value"]
    )
    out = {r.bucket: r for r in gapfill(df, "series", "ts", "value").collect()}
    assert len(out) == 4
    assert out["2024-01-01 01:00:00"].is_gap == 1
    assert out["2024-01-01 01:00:00"].n_events == 0
    assert out["2024-01-01 01:00:00"].locf_value == 10.0
    assert out["2024-01-01 01:00:00"].interp_value == 20.0
    assert out["2024-01-01 02:00:00"].interp_value == 30.0
    assert out["2024-01-01 00:00:00"].is_gap == 0
    assert out["2024-01-01 03:00:00"].interp_value == 40.0


def test_gapfill_head_backfill_and_tail_locf(spark):
    # Series b starts later than series a: its head buckets (forced by
    # a's earlier min) backfill from b's first observation; buckets after
    # the last observation carry it forward. Output is null-free.
    df = spark.createDataFrame(
        [
            ("a", _ts(0), 1.0),
            ("a", _ts(4), 5.0),
            ("b", _ts(2), 7.0),
        ],
        ["series", "ts", "value"],
    )
    rows = gapfill(df, "series", "ts", "value").collect()
    assert len(rows) == 10  # 2 series x 5 hourly buckets
    b = {r.bucket: r for r in rows if r.series == "b"}
    assert b["2024-01-01 00:00:00"].locf_value == 7.0  # head backfill
    assert b["2024-01-01 00:00:00"].interp_value == 7.0
    assert b["2024-01-01 04:00:00"].locf_value == 7.0  # tail LOCF
    assert all(v is not None for r in rows for v in r)


class TestCountMin:
    def _post(self, spark, n_keys=3000, skew_key="hot", hot=500):
        # Way more distinct keys than W=512 buckets -> collisions happen,
        # so the one-sided property is actually load-bearing here.
        rows = [(f"k{i}",) for i in range(n_keys)] + [(skew_key,)] * hot
        return spark.createDataFrame(rows, "term string")

    def test_one_sided_and_heavy_hitter_found(self, spark):
        from pyspark.sql import functions as F

        from koby_s_ai_vector_db_spark.operators.sketches import (
            cm_cells,
            cm_estimate,
        )

        post = self._post(spark)
        cells = cm_cells(post, F.col("term"))
        exact = post.groupBy("term").agg(F.count("*").alias("exact_n"))
        est = cm_estimate(cells, exact.select("term"), "term")
        joined = exact.join(est, "term").collect()
        # estimate >= truth for EVERY key, and collisions exist at
        # 3001 keys over 512 buckets (sum of overcounts > 0).
        assert all(r["est_n"] >= r["exact_n"] for r in joined)
        assert sum(r["est_n"] - r["exact_n"] for r in joined) > 0
        top = max(joined, key=lambda r: r["est_n"])
        assert top["term"] == "hot"
        # error bound sanity: overshoot of the hot key stays far below
        # N*e/W (N ~ 3500, W=512 -> bound ~ 18.6 per row; min over 4
        # rows is almost surely much smaller)
        assert top["est_n"] - top["exact_n"] < 40

    def test_merge_is_cellwise_sum(self, spark):
        from pyspark.sql import functions as F

        from koby_s_ai_vector_db_spark.operators.sketches import cm_cells

        a = self._post(spark, n_keys=200, hot=50)
        b = self._post(spark, n_keys=300, hot=70)
        merged = (
            cm_cells(a, F.col("term"))
            .unionByName(cm_cells(b, F.col("term")))
            .groupBy("d", "bucket")
            .agg(F.sum("c").alias("c"))
        )
        direct = cm_cells(a.unionByName(b), F.col("term"))
        got = sorted(map(tuple, merged.collect()))
        want = sorted(map(tuple, direct.collect()))
        assert got == want


class TestQuantileHistogram:
    def test_merge_is_cellwise_sum_and_bound_holds(self, spark):
        """Cells built on two halves and summed must equal cells built on
        the whole (mergeability), and every estimate must stay within the
        documented one-sided 2^-5 relative bound below the exact rank
        value."""
        from pyspark.sql import functions as F

        from koby_s_ai_vector_db_spark.operators.sketches import (
            QH_SUB_BITS,
            qh_cells,
            qh_quantiles,
        )

        df = spark.range(0, 4001).select(
            (F.col("id") % 3).cast("string").alias("g"),
            (F.col("id") * 7 % 9973 / 10.0).alias("v"),
        )
        whole = qh_cells(df, "v", ["g"])
        halves = qh_cells(df.where("id % 2 = 0"), "v", ["g"]).unionByName(
            qh_cells(df.where("id % 2 = 1"), "v", ["g"])
        )
        merged = halves.groupBy("g", "bucket_id", "lo").agg(
            F.sum("cnt").alias("cnt")
        )
        a = sorted(map(tuple, whole.collect()))
        b = sorted(map(tuple, merged.collect()))
        assert a == b

        qs = [0.5, 0.9, 0.99]
        est = {
            (r.g, r.q): r.est_value
            for r in qh_quantiles(whole, ["g"], qs).collect()
        }
        import math

        vals = {}
        for r in df.collect():
            vals.setdefault(r.g, []).append(r.v)
        for g, vs in vals.items():
            vs.sort()
            for q in qs:
                exact = vs[math.ceil(q * len(vs)) - 1]
                e = est[(g, q)]
                assert e <= exact + 1e-9, (g, q, e, exact)
                assert e >= exact * (1 - 2 ** -QH_SUB_BITS) - 0.011, (g, q, e, exact)

    def test_exact_buckets_below_base(self, spark):
        """Values whose scaled integer is < 64 land in exact unit buckets:
        estimates there are exact to the fixed-point resolution."""
        from koby_s_ai_vector_db_spark.operators.sketches import (
            qh_cells,
            qh_quantiles,
        )

        rows = [("a", v / 100.0) for v in range(60)]
        df = spark.createDataFrame(rows, "g string, v double")
        got = {
            r.q: r.est_value
            for r in qh_quantiles(qh_cells(df, "v", ["g"]), ["g"], [0.5]).collect()
        }
        # ceil(0.5*60) = 30th smallest = 0.29; exact buckets -> estimate
        # equals the value itself, not a lower bound.
        assert got[0.5] == 0.29


def test_qh_bucket_math_properties():
    """Property-check the shared bucket SQL (id monotone in u, lo <= u,
    relative width <= 2^-S) by evaluating the SQL fragments in DuckDB
    against a pure-Python mirror — no Spark needed; the Spark side runs
    the same SQL text."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from koby_s_ai_vector_db_spark.operators.sketches import (
        QH_SUB_BITS,
        _QH_BASE,
        _qh_id_sql,
        _qh_lo_sql,
    )

    con = duckdb.connect()

    def py_bucket(u: int) -> tuple[int, int]:
        if u < _QH_BASE:
            return u, u
        bits = u.bit_length()
        shift = bits - (QH_SUB_BITS + 1)
        top = u >> shift
        return (
            _QH_BASE + (bits - QH_SUB_BITS - 2) * (1 << QH_SUB_BITS)
            + (top - (1 << QH_SUB_BITS)),
            top << shift,
        )

    @settings(max_examples=300, deadline=None)
    @given(st.integers(min_value=0, max_value=2**52))
    def check(u):
        bid, lo = con.execute(
            f"SELECT {_qh_id_sql(str(u))}, {_qh_lo_sql(str(u))}"
        ).fetchone()
        pb, pl = py_bucket(u)
        assert (bid, lo) == (pb, pl), (u, bid, lo, pb, pl)
        assert lo <= u
        if u >= _QH_BASE:
            # bucket width = lo / 2^S exactly (top has S+1 bits)
            assert u - lo < max(1, lo >> QH_SUB_BITS)

    check()

    # monotonicity of id in u across the base boundary and power steps
    prev = -1
    for u in list(range(0, 300)) + [2**k + d for k in range(8, 40) for d in (-1, 0, 1, 7)]:
        bid, _ = py_bucket(u)
        rows = con.execute(f"SELECT {_qh_id_sql(str(u))}").fetchone()
        assert rows[0] == bid
        assert bid >= prev or u < 300  # dense ints may repeat ids only never decrease
        prev = bid if u >= 300 else prev
