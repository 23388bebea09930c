"""Scans — SURVEY.md §2.1.

Reference capability [R]: scan a GridFS collection / metadata-filtered
``find`` without fetching blobs. Spark-native form: parquet scan with
column pruning + predicate pushdown (verified by plan tests in
tests/test_plans.py — PushedFilters + ReadSchema must show both fired).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from modforms_db_spark.io import load
from modforms_db_spark.registry import register
from modforms_db_spark.session import prep


@register(
    "q_scan_full",
    oracle="SELECT r_regionkey, r_name FROM region",
    priority="P0",
    tags=("scan",),
)
def q_scan_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan + projection of region."""
    prep(spark)
    return load(spark, sf_dir, "region").select("r_regionkey", "r_name")


@register(
    "q_scan_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2001-06-01 00:00:00'
    """,
    priority="P0",
    headline=True,
    tags=("scan", "pushdown"),
)
def q_scan_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered 3-column scan — exercises parquet predicate pushdown + pruning."""
    prep(spark)
    import pyspark.sql.functions as F

    return (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") >= F.lit("2001-06-01 00:00:00").cast("timestamp_ntz"))
        .select("l_orderkey", "l_linenumber", "l_shipdate")
    )
