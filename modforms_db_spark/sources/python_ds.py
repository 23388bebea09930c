"""Custom connector via the Python DataSource API (Spark 4) —
SURVEY.md §2.1 extension.

The reference's ingest pulled from bespoke sources (filesystem trees,
GridFS); the modern Spark answer to "my data lives somewhere weird" is a
custom DataSource: implement `schema()` + `reader()`, and the engine
gets partitioned parallel reads, column pruning at the Arrow boundary,
and full DataFrame composability on top — no JVM code.

The demo source generates a calendar dimension deterministically (one
InputPartition per month → one Spark task per month), the standard
"small generated dim" every warehouse needs; a real connector swaps the
generator loop for API/page fetches with the SAME partition contract
(one partition per page range / shard / day).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from modforms_db_spark.registry import register
from modforms_db_spark.session import prep

try:  # Python DataSource API: Spark 4 (gate for older runtimes)
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    _HAVE_PYDS = True
except ImportError:  # pragma: no cover
    _HAVE_PYDS = False


if _HAVE_PYDS:

    class _CalendarReader(DataSourceReader):
        """Q1-2024 calendar, one partition (= one Spark task) per month."""

        def partitions(self):
            return [InputPartition(m) for m in (1, 2, 3)]

        def read(self, partition):
            d = dt.date(2024, partition.value, 1)
            while d.month == partition.value:
                yield (d, d.isoweekday(), d.isoweekday() >= 6)
                d += dt.timedelta(days=1)

    class CalendarDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "mfdb_calendar"

        def schema(self) -> str:
            return "d date, dow int, is_weekend boolean"

        def reader(self, schema):
            return _CalendarReader()


@register(
    "q_source_python_ds",
    oracle="""
    SELECT CAST(month(d) AS INT) AS m,
           COUNT(*) AS n_days,
           CAST(SUM(CASE WHEN isodow(d) >= 6 THEN 1 ELSE 0 END) AS BIGINT)
             AS weekend_days
    FROM (SELECT CAST(unnest(generate_series(DATE '2024-01-01',
                                             DATE '2024-03-31',
                                             INTERVAL 1 DAY)) AS DATE) AS d)
    GROUP BY m
    """,
    priority="P2",
    tags=("source", "python-datasource"),
)
def q_source_python_ds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read a custom Python DataSource (partitioned calendar generator)
    and aggregate per month — proves the connector contract end-to-end:
    partition planning on the driver, per-partition generator execution
    on executors, Arrow transfer, then ordinary Catalyst ops on top.
    """
    if not _HAVE_PYDS:  # pragma: no cover
        raise NotImplementedError("Python DataSource API requires Spark 4+")
    prep(spark)
    spark.dataSource.register(CalendarDataSource)
    cal = spark.read.format("mfdb_calendar").load()
    return cal.groupBy(F.month("d").alias("m")).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.col("is_weekend").cast("bigint")).alias("weekend_days"),
    )
