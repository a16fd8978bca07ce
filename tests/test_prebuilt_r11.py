"""Shape-specific tests for the queries that were prebuilt in round 10
and registered in rounds 10-11 (rel_returned_revenue, then
tok_fertility_report + rel_bloom_semijoin in round 11's free slots).

All three are registered now, so their generic oracle-parity rows were
trimmed per the registration mechanics — test_oracle_parity auto-covers
every registered name. What stays here are the invariants the oracle
hash cannot see: ratio reconstructability, bloom no-false-negative /
bitmap-bound guarantees, and the adversarial tiny-filter case."""

from __future__ import annotations

from tests.conftest import SF_DIRS

SF_DIR = SF_DIRS["t2"]


def test_q10_top20_is_nonempty_and_revenue_sorted(spark):
    """The quarter window + returnflag filter must leave a real top-20
    at fixture scale, sorted by the exact revenue (display column is
    rounded AFTER the cut, so it must be non-increasing too)."""
    from koby_s_ai_vector_db_spark.queries.relational_q import (
        rel_returned_revenue,
    )

    rows = rel_returned_revenue(spark, SF_DIR).collect()
    assert len(rows) == 20
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_fertility_ratios_reconstruct_from_totals(spark):
    """bytes_per_*_q6 must equal the quantized ratio of the SAME row's
    totals — the ratio is an audit of the totals, not an independent
    aggregate — and every fixture slice has ≥1 token of each kind."""
    from koby_s_ai_vector_db_spark.queries.text_q import tok_fertility_report

    rows = tok_fertility_report(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["ws_tokens"] > 0 and r["bpe_tokens"] > 0, r
        assert r["bytes_per_bpe_q6"] == round(
            1000000.0 * r["total_bytes"] / r["bpe_tokens"]
        ), r
        assert r["bytes_per_ws_q6"] == round(
            1000000.0 * r["total_bytes"] / r["ws_tokens"]
        ), r


def test_bloom_prefilter_has_no_false_negatives_and_bounded_bitmap(spark):
    """The bloom is a pure physical device: every TRUE semi-join match must
    survive the prefilter (both sides derive (word, mask) from the same key
    expression — a miss would be a silent row loss the oracle parity only
    catches when a fixture key happens to collide), and the bitmap must
    respect its n_words row bound (the bound is what makes it
    broadcastable at any key count)."""
    from pyspark.sql import functions as F

    from koby_s_ai_vector_db_spark.operators.bloom import (
        bloom_build,
        bloom_prefilter,
    )
    from koby_s_ai_vector_db_spark.queries.relational_q import (
        BLOOM_WORDS,
        _bloom_keys,
    )
    from koby_s_ai_vector_db_spark.sources.tables import load_tables

    t = load_tables(spark, SF_DIR, "orders", "lineitem")
    keys = _bloom_keys(t)
    bitmap = bloom_build(keys, "o_orderkey", BLOOM_WORDS)
    assert bitmap.count() <= BLOOM_WORDS

    li = t["lineitem"]
    true_matches = li.join(
        keys, li.l_orderkey == keys.o_orderkey, "left_semi"
    ).count()
    pref = bloom_prefilter(li, "l_orderkey", bitmap, BLOOM_WORDS)
    kept_true = pref.join(
        keys, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi"
    ).count()
    assert kept_true == true_matches, "bloom dropped a true match"
    # and it actually filters: the urgent-1996 slice is ~3% of lineitem
    assert pref.count() < li.count() / 4


def test_bloom_tiny_filter_still_exact(spark):
    """Adversarially small n_words (= 2 words, heavily overloaded) must
    degrade ONLY the prefilter selectivity, never the final result — the
    exact semi-join kills every false positive."""
    from pyspark.sql import functions as F

    from koby_s_ai_vector_db_spark.operators.bloom import (
        bloom_build,
        bloom_prefilter,
    )
    from koby_s_ai_vector_db_spark.queries.relational_q import _bloom_keys
    from koby_s_ai_vector_db_spark.sources.tables import load_tables

    t = load_tables(spark, SF_DIR, "orders", "lineitem")
    keys = _bloom_keys(t)
    bitmap = bloom_build(keys, "o_orderkey", 2)
    li = t["lineitem"]
    pref = bloom_prefilter(li, "l_orderkey", bitmap, 2)
    exact = pref.join(
        keys.hint("merge"),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left_semi",
    )
    want = li.join(
        keys, li.l_orderkey == keys.o_orderkey, "left_semi"
    ).count()
    assert exact.count() == want


def test_bloom_keys_are_unique(spark):
    """rel_bloom_semijoin's exact join is INNER against the key set (a
    left_semi gets pushed below the bitmap join by
    PushLeftSemiThroughJoin, defeating the prefilter — see the query
    docstring); inner == semi only while o_orderkey stays unique in the
    filtered key set. Pin the invariant the equivalence rests on."""
    from koby_s_ai_vector_db_spark.queries.relational_q import _bloom_keys
    from koby_s_ai_vector_db_spark.sources.tables import load_tables

    t = load_tables(spark, SF_DIR, "orders")
    keys = _bloom_keys(t)
    assert keys.count() == keys.distinct().count()


def test_bloom_operator_generalizes_to_string_keys(spark):
    """operators/bloom.py takes any SQL key expression, not just bigints —
    build over string keys and check exact set semantics end-to-end
    (prefilter ⊇ matches; exact join == plain semi-join)."""
    from pyspark.sql import functions as F

    from koby_s_ai_vector_db_spark.operators.bloom import (
        bloom_build,
        bloom_prefilter,
    )

    probe = spark.createDataFrame(
        [(f"u{i % 40}", i) for i in range(400)], "k string, v int"
    )
    keys = spark.createDataFrame(
        [(f"u{i}",) for i in range(0, 40, 3)], "kk string"
    )
    bitmap = bloom_build(keys, "kk", 64)
    pref = bloom_prefilter(probe, "k", bitmap, 64)
    got = (
        pref.join(keys, F.col("k") == F.col("kk"), "inner")
        .groupBy("k")
        .count()
    )
    want = (
        probe.join(keys, probe.k == keys.kk, "left_semi")
        .groupBy("k")
        .count()
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
