"""Round-10 session-4 isolated query measurement (guide §1).

Times named registered queries with the noop sink (warmup + min-of-N) on
one shared session and reports the per-run job count from the status
tracker — the fixed-overhead signal the r10 sessions used to decide
whether a query is plan-bound or job-floor-bound.

Usage: python scripts/r10_s4_measure.py q_sim_ivf_topk [--runs 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()

    os.environ.setdefault("MFDB_SHUFFLE_PARTITIONS", "4")

    from modforms_db_spark.registry import get_registry
    from modforms_db_spark.session import get_spark

    spark = get_spark("r10-s4-measure")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    reg = get_registry()

    for name in args.names:
        fn = reg[name].builder
        sc.setJobDescription(f"{name}: warmup")
        fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        times = []
        tracker = sc.statusTracker()
        jobs_before = max(tracker.getJobIdsForGroup() or [0])
        for i in range(args.runs):
            sc.setJobDescription(f"{name}: run {i}")
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        jobs_after = max(tracker.getJobIdsForGroup() or [0])
        njobs = (jobs_after - jobs_before) / args.runs
        runs = ", ".join(f"{t:.3f}" for t in times)
        print(f"{name}: min={min(times):.3f}s  runs=[{runs}]  jobs/run≈{njobs:.1f}")
        sc.setJobDescription(None)

    spark.stop()


if __name__ == "__main__":
    main()
