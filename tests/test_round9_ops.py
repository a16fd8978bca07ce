"""Behavioral tests for the round-9 work (oracle parity is covered by
test_oracle_parity auto-parameterization; these pin semantics the oracle
comparison alone can't express)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from koby_s_ai_vector_db_spark import registry
from tests.conftest import SF_DIRS

SF = SF_DIRS["t1"]


def _q(name):
    return registry.queries()[name]


def test_source_matrix_builds_lazily(spark):
    """ADVICE r08: the PLANT_OFFSET guard used to run an eager
    src.agg(max).first() at query-construction time, so every plan build
    (test_plans sweeps, registry enumeration) launched a real Spark job.
    The guard now lives IN the plan (broadcast scalar attach wrapping the
    output column); building the DataFrame must schedule zero jobs."""
    sc = spark.sparkContext
    _q("dedup_source_matrix")(spark, SF)  # warm-up: parquet footer reads
    sc.setJobGroup("r9_lazy_build_probe", "construction must be action-free")
    try:
        df = _q("dedup_source_matrix")(spark, SF)
    finally:
        sc.setJobGroup(None, None)
    assert df.columns == ["source_a", "source_b", "n_pairs", "sum_jac_q6"]
    jobs = sc.statusTracker().getJobIdsForGroup("r9_lazy_build_probe")
    assert not jobs, f"query construction launched Spark jobs: {jobs}"


def test_source_matrix_guard_fires_past_plant_offset(spark, tmp_path):
    """The in-plan guard must still fail loudly when base doc ids cross
    PLANT_OFFSET (modular attribution would silently misattribute
    sources). Shift the fixture corpus past the offset and execute."""
    from koby_s_ai_vector_db_spark.queries.dedup_q import PLANT_OFFSET

    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    shifted = docs.withColumn(
        "doc_id", (F.col("doc_id") + F.lit(2 * PLANT_OFFSET)).cast("long")
    )
    bad_dir = str(tmp_path / "past_offset")
    shifted.write.parquet(os.path.join(bad_dir, "documents.parquet"))

    df = _q("dedup_source_matrix")(spark, bad_dir)  # build stays lazy
    with pytest.raises(Exception, match="PLANT_OFFSET"):
        df.collect()


def test_steady_state_query_construction_is_action_free(spark):
    """Registry-wide generalization of the dedup_source_matrix lesson
    (ADVICE r08): after a query has been built once (memoized state,
    scratch indexes, and eager contractions are allowed to build on
    FIRST call), re-building it must schedule ZERO Spark jobs. The
    driver builds every query before executing it — a per-build action
    doubles work at any scale, and an eager action in a hot query-build
    path is invisible to the oracle comparison."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def _real_jobs(group):
        # Parquet schema-inference footer reads ("parquet at ...") are
        # Spark-internal per-read jobs, not engine actions — the index
        # sources re-open their parquet segments per build by design
        # (fixture tables are covered by the load_table memo). Everything
        # else (collect, localCheckpoint, first, toLocalIterator) counts.
        out = []
        for j in tracker.getJobIdsForGroup(group):
            info = tracker.getJobInfo(j)
            names = []
            for s in list(info.stageIds):
                si = tracker.getStageInfo(s)
                if si is not None:
                    names.append(si.name)
            if not all(n.startswith("parquet at") for n in names):
                out.append((j, names))
        return out

    qs = registry.queries()
    for name, fn in qs.items():
        fn(spark, SF)  # first build: memo/index/eager state allowed
    offenders = {}
    for name, fn in qs.items():
        group = f"r9_lazy_{name}"
        sc.setJobGroup(group, "steady-state build must be action-free")
        try:
            fn(spark, SF)
        finally:
            sc.setJobGroup(None, None)
        jobs = _real_jobs(group)
        if jobs:
            offenders[name] = jobs
    assert not offenders, (
        f"queries whose steady-state construction schedules Spark jobs: "
        f"{offenders}"
    )
