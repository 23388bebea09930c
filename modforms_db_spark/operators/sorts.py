"""Sorts / limits / top-k — SURVEY.md §2.6.

Reference capabilities [R]: "smallest incomplete level first" work queues;
largest-coefficient worst cases.

Scale note: orderBy+limit compiles to TakeOrderedAndProject — per-partition
top-k then a driver-side merge of k·partitions rows, never a full sort of
the table. The plan test asserts this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from modforms_db_spark.io import load
from modforms_db_spark.registry import register
from modforms_db_spark.session import prep


@register(
    "q_sort_multikey",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    priority="P0",
    tags=("sort", "limit"),
)
def q_sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort + LIMIT with a unique tiebreak key (deterministic
    result set despite order-insensitive hashing)."""
    prep(spark)
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(
            F.asc("o_orderpriority"), F.desc("o_totalprice"), F.asc("o_orderkey")
        )
        .limit(100)
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
    )


@register(
    "q_topk_global",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 10
    """,
    priority="P1",
    tags=("sort", "topk"),
)
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by extendedprice (composite tiebreak)."""
    prep(spark)
    li = load(spark, sf_dir, "lineitem")
    return (
        li.orderBy(
            F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
        )
        .limit(10)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


_TIES_K = 10


@register(
    "q_topk_with_ties",
    oracle=f"""
    WITH c AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    ), thr AS (
      SELECT CAST(MIN(n_orders) AS BIGINT) AS thr FROM (
        SELECT n_orders FROM c
        ORDER BY n_orders DESC, o_custkey LIMIT {_TIES_K}
      )
    )
    SELECT c.o_custkey, c.n_orders, thr.thr
    FROM c CROSS JOIN thr
    WHERE c.n_orders >= thr.thr
    """,
    priority="P2",
    tags=("sort", "topk", "ties"),
)
def q_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k WITH TIES (the SQL-standard FETCH FIRST k ROWS WITH TIES
    semantics, ≡ RANK() ≤ k): the k most-ordered customers PLUS every
    customer tied with the k-th — the fair-leaderboard form of
    `q_topk_global`, which truncates tie groups arbitrarily.
    Implemented the scalable two-phase way: phase 1 takes the k-th
    value via a global top-k (TakeOrdered — per-partition heaps, no
    sort of the full grain) and broadcasts it as a scalar threshold;
    phase 2 is a plain filter `n >= threshold` over the count grain.
    No rank window ever touches the full data — the threshold join
    IS the WITH TIES operator at 100 TB.

    Exact integer counts; with heavy tie mass at the boundary the
    result is legitimately larger than k (law-pinned).

    Scale: one pass to the customer count grain, a k-row TakeOrdered,
    a 1-row broadcast, one filter.
    """
    prep(spark)
    c = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
        .localCheckpoint(eager=False)  # threshold frame + filter pass
    )
    thr = (
        c.orderBy(F.col("n_orders").desc(), "o_custkey")
        .limit(_TIES_K)
        .agg(F.min("n_orders").cast("bigint").alias("thr"))
    )
    return (
        c.crossJoin(F.broadcast(thr))
        .where(F.col("n_orders") >= F.col("thr"))
        .select("o_custkey", "n_orders", "thr")
    )
