"""Interleaved A/B for the r10-s4 rewrites: old vs new q_sim_ivf_topk and
q_dedup_substring shapes in ONE session, alternating runs so host-noise
windows hit both variants equally. Also asserts frame equality old==new."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("MFDB_SHUFFLE_PARTITIONS", "4")

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from modforms_db_spark.io import load, spread  # noqa: E402
from modforms_db_spark.llm.similarity import (  # noqa: E402
    _emb,
    _norm,
    ivf_cell_cs,
    ivf_centroids,
)
from modforms_db_spark.registry import get_registry  # noqa: E402
from modforms_db_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
_SUBSTR_W = 30


def old_ivf(spark, sf_dir) -> DataFrame:
    e = _emb(spark, sf_dir).withColumn("nrm", _norm("emb"))
    c = ivf_centroids(e)
    asg_ids = (
        ivf_cell_cs(e, c)
        .groupBy("vec_id")
        .agg(
            F.max_by(
                "cid", F.struct(F.col("cs"), (-F.col("cid")).alias("nc"))
            ).alias("cid")
        )
    )
    asg = e.join(asg_ids, "vec_id")
    eq = e.where(F.col("vec_id") < 20)
    wq = Window.partitionBy("vec_id").orderBy(F.desc("cs"), F.asc("cid"))
    probe = (
        ivf_cell_cs(eq, c)
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= 4)
        .join(F.broadcast(eq), "vec_id")
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("emb").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
            "cid",
        )
    )
    cand = asg.join(F.broadcast(probe), "cid").where(
        F.col("vec_id") != F.col("q_id")
    )
    from modforms_db_spark.llm.similarity import _dot

    cos4 = F.round(
        _dot("q_emb", "emb") / (F.col("q_nrm") * F.col("nrm")), 4
    ).alias("cos4")
    scored = cand.select("q_id", F.col("vec_id").alias("nb_id"), cos4)
    w = Window.partitionBy("q_id").orderBy(F.desc("cos4"), F.asc("nb_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("q_id", "nb_id", "cos4", "rn")
    )


def old_substring(spark, sf_dir) -> DataFrame:
    d = spread(load(spark, sf_dir, "documents"))
    toks = F.split("text", " ")
    wins = (
        d.where(F.size(toks) >= _SUBSTR_W)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.size(toks) - _SUBSTR_W + 1),
                        lambda i: F.concat_ws(" ", F.slice(toks, i, _SUBSTR_W)),
                    )
                )
            ).alias("win"),
        )
    )
    a, b = wins.alias("a"), wins.alias("b")
    return (
        a.join(
            b,
            (F.col("a.win") == F.col("b.win"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def main() -> None:
    spark = get_spark("r10-s4-ab")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    reg = get_registry()

    variants = {
        "ivf_old": lambda: old_ivf(spark, SF_DIR),
        "ivf_new": lambda: reg["q_sim_ivf_topk"].builder(spark, SF_DIR),
        "sub_old": lambda: old_substring(spark, SF_DIR),
        "sub_new": lambda: reg["q_dedup_substring"].builder(spark, SF_DIR),
    }

    # frame equality old == new (sorted pandas compare)
    for base in ("ivf", "sub"):
        o = variants[f"{base}_old"]().toPandas()
        n = variants[f"{base}_new"]().toPandas()
        cols = sorted(o.columns)
        o = o[cols].sort_values(cols).reset_index(drop=True)
        n = n[cols].sort_values(cols).reset_index(drop=True)
        assert o.equals(n), f"{base}: old != new"
        print(f"{base}: old == new frame-equal ({len(o)} rows)")

    # warmup each
    for name, fn in variants.items():
        sc.setJobDescription(f"warmup {name}")
        fn().write.format("noop").mode("overwrite").save()

    times: dict[str, list[float]] = {k: [] for k in variants}
    rounds = int(os.environ.get("AB_ROUNDS", "7"))
    for r in range(rounds):
        for name, fn in variants.items():
            sc.setJobDescription(f"{name} round {r}")
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        runs = ", ".join(f"{t:.3f}" for t in ts)
        print(f"{name}: min={min(ts):.3f}  median={sorted(ts)[len(ts)//2]:.3f}  [{runs}]")
    spark.stop()


if __name__ == "__main__":
    main()
