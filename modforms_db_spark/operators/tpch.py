"""Classic multi-join analytics (TPC-H Q3/Q5/Q10 analogues, adapted to
the driver schema) — the reference's reporting surface [R] (per-space
work queues, completeness reports over joined dimensions) generalizes to
exactly these shapes: selective dimension filter → fact join chain →
grouped revenue → top-k.

These exist alongside the single-operator rows of SURVEY §2 to exercise
what none of them do alone: MULTI-join plans where Catalyst must order
joins, push each dimension predicate below its join, and broadcast every
small side. Plan obligations are asserted in tests/test_plans.py.

Scale: each query's fact side shuffles at most once per fact key; all
dimension sides (region/nation/customer-after-filter) broadcast. Revenue
sums are r2-rounded at emission only (parity rule, SURVEY §2 dialect
notes); top-k carries a unique-key tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from modforms_db_spark.io import load
from modforms_db_spark.oracle_dialect import R2
from modforms_db_spark.registry import register
from modforms_db_spark.session import prep

_REVENUE = "l_extendedprice * (1 - l_discount)"


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q_tpch_q3",
    oracle=f"""
    SELECT l.l_orderkey,
           {R2(f'SUM({_REVENUE})')} AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    priority="P1",
    tags=("tpch", "join", "topk"),
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority (TPC-H Q3): top-10 highest-revenue orders taken
    before the cutoff but shipped after it, for one market segment.
    Segment filter shrinks customer to a broadcastable side; lineitem
    (the only big side) shuffles once on l_orderkey."""
    prep(spark)
    c = load(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    cutoff = F.lit("1998-06-01 00:00:00").cast("timestamp_ntz")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q_tpch_q5",
    headline=True,
    oracle=f"""
    SELECT n.n_name, {R2(f'SUM({_REVENUE})')} AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    priority="P1",
    tags=("tpch", "join"),
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier volume (TPC-H Q5): revenue per nation where the
    customer and supplier share the nation, one region, two years. Six
    tables; region→nation→supplier collapse to a broadcast chain, and
    the c_nationkey = s_nationkey clause rides the customer join."""
    prep(spark)
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    sn = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .join(
            c,
            (o.o_custkey == c.c_custkey)
            & (sn.s_nationkey == c.c_nationkey),
        )
        .groupBy("n_name")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )


@register(
    "q_tpch_q10",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {R2(f'SUM({_REVENUE})')} AS revenue,
           {R2('c.c_acctbal')} AS c_acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-07-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    priority="P1",
    tags=("tpch", "join", "topk"),
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting (TPC-H Q10): top-20 customers by revenue
    lost to returns in one quarter. The returnflag filter prunes the
    fact scan; nation broadcasts onto the customer dimension."""
    prep(spark)
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-07-01 00:00:00").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q_tpch_q18",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 150
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           {R2('o.o_totalprice')} AS o_totalprice,
           {R2('SUM(l.l_quantity)')} AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN big        ON o.o_orderkey = big.l_orderkey
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    priority="P1",
    tags=("tpch", "join", "having", "topk"),
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers (TPC-H Q18): orders whose total quantity
    exceeds a threshold, joined back to customer detail, top-20 by
    order value. The shape single-operator rows don't cover: a HAVING
    aggregate used as a semi-filter on the same fact it came from —
    the "work queue of spaces above a completeness threshold" report
    [R].

    Scale: the `big` filter aggregates lineitem keyed on l_orderkey and
    keeps only qualifying keys (tiny); joining it back broadcast-prunes
    the second lineitem pass, and both lineitem shuffles share the
    l_orderkey partitioning (AQE reuses the exchange)."""
    prep(spark)
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("tq"))
        .where(F.col("tq") > 150)
        .select("l_orderkey")
    )
    return (
        li.join(F.broadcast(big), "l_orderkey")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


@register(
    "q_tpch_q22",
    oracle=f"""
    WITH avg_bal AS (
      SELECT {R2('AVG(c_acctbal)')} AS a FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_custs,
           {R2('SUM(c.c_acctbal)')} AS total_bal
    FROM customer c CROSS JOIN avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_nationkey
    """,
    priority="P1",
    tags=("tpch", "anti-join", "subquery"),
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-sales-opportunity (TPC-H Q22 shape): customers with an
    above-average balance and NO orders, grouped by nation — the
    "well-funded but inactive" completeness report, composing a scalar
    aggregate threshold with an existence anti-join.

    Spark shape: the threshold is a broadcast 1-row aggregate (rounded
    to 2 dp on both engines so an ulp of summation-order noise cannot
    flip a boundary row), the NOT EXISTS is a left_anti join against
    the projected order keys; at 100 TB the anti join shuffles on
    custkey once and the threshold costs one linear pass."""
    prep(spark)
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").select("o_custkey")
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        F.round(F.avg("c_acctbal"), 2).alias("a")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )
