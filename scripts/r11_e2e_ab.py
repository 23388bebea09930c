#!/usr/bin/env python
"""r11 A/B (VERDICT r10 item 6): q_pipeline_e2e current two-scan form
vs a fused rep+canon grain (one corpus pass carrying lang/n_toks/h
through the bigram aggregation as first() aggregates, no join-back).

Equivalence checked (collected frames equal as sets) before timing.
"""

from __future__ import annotations

import gc
import os
import sys
import time

os.environ.setdefault("MFDB_SHUFFLE_PARTITIONS", "4")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from modforms_db_spark.session import get_spark  # noqa: E402
from modforms_db_spark.io import load, spread  # noqa: E402
from modforms_db_spark.registry import get_registry  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(sys.argv[1]) if len(sys.argv) > 1 else 7


def fused(spark):
    d = spread(load(spark, SF, "documents"))
    toks = F.split("text", " ")
    canon = F.sha2(
        F.array_join(F.array_sort(F.array_distinct(toks)), " "), 256
    )
    pre = d.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_toks"),
        canon.alias("h"),
        F.split("text", " ").alias("t"),
    ).where(F.size("t") > 1)
    bg = pre.select(
        "doc_id",
        "lang",
        "n_toks",
        "h",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, 2)),
            )
        ).alias("bigram"),
    )
    per = (
        bg.groupBy("doc_id", "bigram")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.first("lang").alias("lang"),
            F.first("n_toks").alias("n_toks"),
            F.first("h").alias("h"),
        )
        .groupBy("doc_id")
        .agg(
            F.max("n").alias("top_n"),
            F.sum("n").alias("total"),
            F.first("lang").alias("lang"),
            F.first("n_toks").alias("n_toks"),
            F.first("h").alias("h"),
        )
        .where(F.col("top_n") * 1.0 / F.col("total") <= 0.1)
    )
    reps = per.groupBy("h").agg(
        F.min_by(F.struct("lang", "n_toks"), "doc_id").alias("r")
    )
    return reps.groupBy(F.col("r.lang").alias("lang")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("r.n_toks").cast("bigint").alias("total_tokens"),
    )


def main() -> None:
    spark = get_spark("r11-e2e-ab")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    reg = get_registry()

    cur = lambda: reg["q_pipeline_e2e"].builder(spark, SF)  # noqa: E731

    a = {tuple(r) for r in cur().collect()}
    b = {tuple(r) for r in fused(spark).collect()}
    assert a == b, (sorted(a), sorted(b))
    print(f"frames equal ({len(a)} rows)")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    noop(cur())
    noop(fused(spark))
    res = {"current": [], "fused": []}
    jobs = {}
    for i in range(N):
        for label, fn in (("current", cur), ("fused", lambda: fused(spark))):
            gc.collect()
            grp = f"{label}#{i}"
            sc.setJobGroup(grp, label)
            t0 = time.perf_counter()
            noop(fn())
            res[label].append(time.perf_counter() - t0)
            jobs[label] = len(tracker.getJobIdsForGroup(grp) or [])
            sc.setJobGroup(None, None)
    for label in res:
        ts = sorted(res[label])
        print(
            f"{label}: min={ts[0]:.3f} med={ts[len(ts)//2]:.3f} "
            f"jobs={jobs[label]} all={[round(t,2) for t in ts]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
