"""Physical-plan regression guards.

Correctness is the oracle's job; these tests pin the PLANS the operators
were designed around (README "Design stance"), so a refactor can't quietly
reintroduce a scale-killer:

  - no CartesianProduct anywhere: every intentional all-pairs comparison
    must ride a broadcast (BroadcastNestedLoopJoin) of a bounded side, and
    quadratic candidate generation is banned outright (LSH buckets / IVF
    lists / inverted postings instead);
  - rank-then-filter top-k plans through WindowGroupLimit (Spark >= 3.5
    pre-truncates each task's input to k before the shuffle);
  - the lexical candidate caps plan as TakeOrderedAndProject (two-phase
    per-partition top-N), not a global sort.

Plans are inspected at sf0.001 WITHOUT executing jobs — planning is
driver-side.
"""

from __future__ import annotations

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIRS

SF_DIR = SF_DIRS["t1"]


def _plan(spark, name: str) -> str:
    df = entry_mod.queries()[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_no_cartesian_product_anywhere(spark):
    offenders = {}
    for name in entry_mod.queries():
        plan = _plan(spark, name)
        if "CartesianProduct" in plan:
            offenders[name] = plan.splitlines()[0]
    assert not offenders, f"unbroadcast all-pairs joins: {sorted(offenders)}"


def test_topk_rank_uses_window_group_limit(spark):
    for name in ("q1_topk_cosine", "knn_self_join", "q2_ann"):
        assert "WindowGroupLimit" in _plan(spark, name), name


def test_lexical_caps_use_take_ordered(spark):
    for name in ("q3_contribution_search", "q4_keyword_search"):
        assert "TakeOrderedAndProject" in _plan(spark, name), name


def test_hyperplane_sketch_is_map_side(spark):
    """The 64-bit angular sketch must be computed in one map-side
    expression (literal sign masks), NOT reassembled via a groupBy on the
    vector id — the round-2 shape shuffled 64× the corpus row count keyed
    on _id before banding (operators/dedup.py:hyperplane_lsh_pairs)."""
    plan = _plan(spark, "dedup_embedding_lsh")
    assert "hashpartitioning(_id" not in plan, "sketch-fold shuffle is back"
    assert "keys=[_id" not in plan, "sketch bits reassembled via per-id aggregate"
