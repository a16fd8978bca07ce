"""Round-11 prebuilt queries: implemented + oracle-checked in round 10,
but not yet registered. The @register decorations land in round 11's
free slots; until then this module keeps the capabilities
parity-checked every pytest run (the same mechanics that carried every
prebuild since round 8).

rel_returned_revenue graduated early: fold ladder step 4
(q13_effectiveness → q7_fusion, late round 10) freed a round-10 window
slot, so it is registered and covered by test_oracle_parity — its rows
here were trimmed per the registration mechanics; the shape-specific
top-20 test below stays."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIRS, assert_matches_oracle, register_views

SF_DIR = SF_DIRS["t2"]


def _prebuilt_r11():
    from koby_s_ai_vector_db_spark.queries import text_q

    return [
        ("tok_fertility_report", text_q.tok_fertility_report,
         text_q._FERTILITY_ORACLE),
    ]


@pytest.mark.parametrize(
    "name,fn,sql", _prebuilt_r11(),
    ids=lambda p: p if isinstance(p, str) else "",
)
def test_prebuilt_query_matches_oracle(spark, duck, name, fn, sql):
    register_views(duck, SF_DIR)
    assert_matches_oracle(fn(spark, SF_DIR), duck, sql)


@pytest.mark.parametrize(
    "name,fn,sql", _prebuilt_r11(),
    ids=lambda p: p if isinstance(p, str) else "",
)
def test_prebuilt_runs_at_t1(spark, name, fn, sql):
    df = fn(spark, SF_DIRS["t1"])
    assert df.columns
    assert df.limit(1).collect() is not None


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
