"""Oracle-parity helpers (standing rules, SURVEY.md §2.11).

- Every aggregated/computed DOUBLE in a declared query is rounded — 4 dp
  generally, 2 dp for money — on BOTH engines, because summation order
  differs between Spark and DuckDB and the driver hash-matches values.
- Every top-k/limit query carries a unique-key tiebreak.
- Timestamps are TIMESTAMP_NTZ end-to-end (see io.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def r2(c: Column | str) -> Column:
    return F.round(c, 2)


def r4(c: Column | str) -> Column:
    return F.round(c, 4)
