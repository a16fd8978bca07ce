"""Round-10 operational pins: the Q3 shuffle-path twin.

VERDICT r09 item 6 asked for evidence that the TPC-H Q3 shape survives
the scale regime where its customer side stops being broadcastable. The
twin (queries/relational_q.py::rel_shipping_priority_shuffle) forces the
shuffle join with merge hints; these tests pin (1) that it actually
plans as a sort-merge join — a silently-ignored hint would make the sf1
probe measure the broadcast plan twice — and (2) that it returns
byte-identical results to the registered broadcast-path query.
"""

from __future__ import annotations

from tests.conftest import SF_DIRS

SF_DIR = SF_DIRS["t2"]


def _rows(df):
    return sorted(map(tuple, ((r[c] for c in sorted(df.columns)) for r in df.collect())))


def test_q3_shuffle_twin_matches_broadcast_plan(spark):
    from koby_s_ai_vector_db_spark.queries.relational_q import (
        rel_shipping_priority,
        rel_shipping_priority_shuffle,
    )

    a = _rows(rel_shipping_priority(spark, SF_DIR))
    b = _rows(rel_shipping_priority_shuffle(spark, SF_DIR))
    assert a == b
    assert a, "fixture must produce a non-empty top-10"


def test_q3_shuffle_twin_plans_sort_merge(spark):
    from koby_s_ai_vector_db_spark.queries.relational_q import (
        rel_shipping_priority_shuffle,
    )

    p = (
        rel_shipping_priority_shuffle(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" in p, p.splitlines()[:10]
    assert "BroadcastHashJoin" not in p, "hint ignored — probe would lie"


def test_q13_is_reconstructable_from_q7(spark):
    """SURVEY §9 fold ladder step 4 evidence (executed late round 10):
    q13_effectiveness's full result reconstructs exactly from
    q7_fusion's hash-checked row — query_length, search_effectiveness,
    recommendation and total_sources are carried verbatim; the three
    boolean flags are views of q7's counts — so the q13 window slot
    folds into q7."""
    from koby_s_ai_vector_db_spark.queries.fusion_q import (
        q13_effectiveness,
        q7_fusion,
    )

    q7 = {r["query_id"]: r for r in q7_fusion(spark, SF_DIR).collect()}
    q13 = q13_effectiveness(spark, SF_DIR).collect()
    assert q13 and len(q7) == len(q13)
    for r in q13:
        m = q7[r["query_id"]]
        assert r["query_length"] == m["query_length"]
        assert r["faiss_results_found"] == (m["faiss_count"] > 0)
        assert r["contributions_found"] == m["has_contributions"]
        assert r["total_sources"] == m["total_sources"]
        assert r["search_effectiveness"] == m["search_effectiveness"]
        assert r["has_enhanced_content"] == m["has_contributions"]
        assert r["recommendation"] == m["recommendation"]
