"""SparkSession factory + per-query session preparation.

Two distinct paths:

- :func:`get_spark` — our own session (tests, bench.py): local[$SPARK_GRAFT_CPUS],
  AQE on, shuffle partitions sized for single-node SF (SURVEY.md §4: "8-32, not
  the 200 default"), UTC timezone, Arrow enabled.
- :func:`prep` — called at the top of every registered query builder, because the
  DRIVER owns the session there (__spark_entry__.py contract). Only touches
  runtime-settable confs that correctness depends on (timezone; Arrow for the
  pandas-UDF operators). Never assumes our factory ran.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "modforms-db-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle = os.environ.get("MFDB_SHUFFLE_PARTITIONS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("MFDB_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    return spark


def prep(spark: SparkSession) -> SparkSession:
    """Pin runtime confs correctness depends on; safe on any session.

    UTC so TIMESTAMP values collected from Spark equal DuckDB's naive
    timestamps (FIXTURES.md parity rules); Arrow so pandas-UDF operators run
    vectorized instead of falling back to pickle.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    except Exception:
        pass  # conf may be restricted on an unknown session; Arrow is perf-only
    return spark
