#!/usr/bin/env python
"""Round-13 optimization profiler: split each query's bench-loop cost into
construction (Python DataFrame building), planning (analyze+optimize+
physical plan), and execution (noop write), and count the Spark jobs each
execution launches.

The bench timed loop pays construct + plan + execute per call; this tool
says WHICH of the three to attack per query (guide §1: measure first).

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      python scripts/opt_profile.py [query ...]
With no query args, profiles every registered query. Output: one TSV row
per query on stdout (diagnostics on stderr), sorted by total.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    only = set(sys.argv[1:])

    from koby_s_ai_vector_db_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("opt-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    qs = entry_mod.queries()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}

    # Warm-up identical to bench.py: builds memo artifacts + JIT.
    warm0 = time.perf_counter()
    for name, fn in entry_mod.queries().items():
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:
            print(f"[warmup] {name} failed: {exc}", file=sys.stderr)
    print(f"[profile] warmup {time.perf_counter()-warm0:.1f}s", file=sys.stderr)

    tracker = sc.statusTracker()
    rows = []
    for name, fn in qs.items():
        try:
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t_construct = time.perf_counter() - t0

            t0 = time.perf_counter()
            # Force analysis + optimization + physical planning (not AQE
            # final plan — that needs execution) of the same tree the
            # write below will re-plan.
            df._jdf.queryExecution().executedPlan()
            t_plan = time.perf_counter() - t0

            execs = []
            n_jobs = 0
            for i in range(3):
                group = f"prof-{name}-{i}"
                sc.setJobGroup(group, name)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                execs.append(time.perf_counter() - t0)
                if i == 0:
                    n_jobs = len(tracker.getJobIdsForGroup(group))
                sc.setJobGroup(None, None)

            # Full-loop repeat: what bench.py actually times per call.
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            t_loop = time.perf_counter() - t0

            rows.append(
                {
                    "name": name,
                    "construct": round(t_construct, 3),
                    "plan": round(t_plan, 3),
                    "exec_first": round(execs[0], 3),
                    "exec_min": round(min(execs), 3),
                    "loop": round(t_loop, 3),
                    "n_jobs": n_jobs,
                }
            )
            print(
                f"[profile] {name}: construct={t_construct:.3f} "
                f"plan={t_plan:.3f} exec={execs} jobs={n_jobs} "
                f"loop={t_loop:.3f}",
                file=sys.stderr,
            )
        except Exception as exc:
            print(f"[profile] {name}: FAILED {exc}", file=sys.stderr)

    rows.sort(key=lambda r: -(r["construct"] + r["plan"] + r["exec_min"]))
    print("name\tconstruct\tplan\texec_first\texec_min\tloop\tn_jobs")
    for r in rows:
        print(
            f"{r['name']}\t{r['construct']}\t{r['plan']}\t{r['exec_first']}"
            f"\t{r['exec_min']}\t{r['loop']}\t{r['n_jobs']}"
        )
    with open("/tmp/opt_profile.json", "w") as fh:
        json.dump(rows, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
