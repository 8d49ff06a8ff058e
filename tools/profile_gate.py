"""Per-gate profiler: wall time + Spark job/stage counts per query.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/profile_gate.py q1_pricing_summary dedup_minhash_lsh ...

For each named query (from __spark_entry__.queries()):
  - one untimed warm run (fixtures, codegen)
  - one timed run inside a job group, reporting wall seconds, #jobs,
    #stages/tasks (from the status tracker) — the stage-floor evidence the
    optimization guide (§1) asks for before restructuring a gate.
Prints a table to stdout.  Not part of the bench contract; diagnostic only.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: profile_gate.py <query> [query ...]", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from kartothek_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("kartothek_spark_profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    print(f"{'query':40s} {'sec':>7s} {'jobs':>5s} {'stages':>7s} {'tasks':>6s}")
    for name in names:
        fn = qs[name]
        # warm run: fixture build + codegen happen here, not in the timing
        fn(spark, sf_dir).count()
        group = f"profile_{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        job_ids = tracker.getJobIdsForGroup(group)
        n_stages = 0
        n_tasks = 0
        for jid in job_ids:
            ji = tracker.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None and si.numTasks > 0 and si.numCompletedTasks > 0:
                    n_stages += 1
                    n_tasks += si.numTasks
        print(
            f"{name:40s} {dt:7.3f} {len(job_ids):5d} {n_stages:7d} {n_tasks:6d}",
            flush=True,
        )


if __name__ == "__main__":
    main()
