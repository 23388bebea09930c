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


def d38(c: Column | str) -> Column:
    """Widen an integer operand to DECIMAL(38,0) so the product and the
    sum accumulating it stay integer-exact at any realistic scale.

    Spark accumulates SUM(BIGINT) in a raw long. A partial sum past
    2^63 is a hard arithmeticOverflowError under ANSI (Spark 4's
    default — a dead query at scale) and a silent WRAP to a wrong value
    under the common ANSI-off compatibility setting (neither prep() nor
    the session factory pins spark.sql.ansi.enabled, so deployments can
    be either). The exact-integer stats substrate multiplies ~1e6-scale
    integers (scaled cents, per-scope ranks, tie sizes) and sums them
    over whole table scopes, so the wrap thresholds are low:
    Σcents² wraps past ~8e6 rows/scope, Σrank² past n ≈ 3e6, a single
    tie-cube term t³ overflows the PRODUCT at t > 2.1e6, while plain
    count/cents sums only wrap past ~1e13 rows — unreachable. Widening
    the FIRST operand makes both the product (decimal(38,0): exact for
    |v| < 10^38) and the decimal accumulator wrap-proof; DuckDB oracles
    already agree because its SUM(BIGINT) accumulates in HUGEINT
    (int128). Casting the widened sum back to bigint keeps output
    schemas unchanged and is value-identical wherever the old path did
    not overflow. Precedent: the r10 q_breusch_pagan fix (r9 ADVICE);
    the r10 sweep then widened every integer product-sum/rank-sum whose
    accumulated magnitude can cross 2^63 at large-scale row counts
    (squares, cross-moments, tie cubes, count-squared frequency
    moments, formula-level products of widened sums), and left the
    provably bounded ones (sums of per-row counts/flags whose total is
    capped by corpus row count ≪ 2^63) on the fast long accumulator."""
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("decimal(38,0)")


def r2(c: Column | str) -> Column:
    return F.round(c, 2)


def r4(c: Column | str) -> Column:
    return F.round(c, 4)
