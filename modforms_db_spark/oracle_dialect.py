"""DuckDB-oracle dialect helpers (SURVEY.md §2.11 standing rules).

The one non-obvious piece: **round parity**. Spark's ``round(double, n)``
rounds the SHORTEST DECIMAL REPRESENTATION of the double (Java
``BigDecimal.valueOf(x).setScale(n, HALF_UP)``), while DuckDB's native
``ROUND(double, n)`` does binary float math (``x*10^n`` then round) — the
two disagree on ~0.1% of arbitrary per-row products (measured on sf0.001
lineitem: e.g. shortest-repr ``70160.805`` → Spark ``70160.81`` but DuckDB
``70160.80``).

:func:`R` emulates Spark's semantics inside DuckDB exactly:
``CAST(x AS VARCHAR)`` yields the shortest roundtrip repr (DuckDB uses
shortest-float formatting), parsing it as DECIMAL(38,18) is exact, decimal
ROUND is exact half-away-from-zero (== Java HALF_UP for both signs), and
the final cast back to DOUBLE is the same nearest-double conversion Spark's
``Decimal.toDouble`` performs. Verified row-for-row on the driver data.
"""

from __future__ import annotations


def R(expr: str, n: int) -> str:
    """DuckDB SQL that matches Spark's ``round(expr, n)`` on DOUBLEs."""
    return (
        f"CAST(ROUND(CAST(CAST(({expr}) AS VARCHAR) AS DECIMAL(38,18)), {n}) AS DOUBLE)"
    )


def R2(expr: str) -> str:
    return R(expr, 2)


def R4(expr: str) -> str:
    return R(expr, 4)
