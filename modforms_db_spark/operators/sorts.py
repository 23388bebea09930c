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
