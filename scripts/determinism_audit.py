#!/usr/bin/env python
"""Partition-layout determinism audit: run every registered query under
two different shuffle-partition counts and compare order-insensitive
value hashes.

The external driver runs queries in ITS OWN session (its own partition
config), so a result that depends on shuffle layout — a float aggregate
whose partial-sum order shifts a 4-dp rounding across a boundary, a
top-k with an incomplete tiebreak, time-dependent expressions — would
hash-mismatch there while passing the local suite. This audit is the
Spark-vs-Spark complement of the Spark-vs-DuckDB parity sweep.

    python scripts/determinism_audit.py [sf_dir] [partsA] [partsB] [--only regex]

Exit 0 iff every query hashes identically under both layouts.
(Round-4 baseline: 308/308 identical under 32 vs 7 partitions.)
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _run_all(sf_dir: str, parts: int, only=None) -> dict[str, str]:
    from pyspark.sql import SparkSession

    from modforms_db_spark.registry import get_registry

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", str(parts))
        .config("spark.default.parallelism", str(parts))
        .getOrCreate()
    )
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    out: dict[str, str] = {}
    for name, q in get_registry().items():
        if only is not None and not only.search(name):
            continue
        try:
            pdf = q.builder(spark, sf_dir).toPandas()
            pdf = pdf.reindex(sorted(pdf.columns), axis=1)
            out[name] = hashlib.sha256(
                "\n".join(
                    sorted(
                        "\x01".join(map(str, r))
                        for r in pdf.itertuples(index=False)
                    )
                ).encode()
            ).hexdigest()
        except Exception as exc:  # noqa: BLE001 — audit must keep going
            out[name] = f"ERR:{type(exc).__name__}"
    spark.stop()
    return out


def main() -> int:
    import re

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    pa = int(args[1]) if len(args) > 1 else 32
    pb = int(args[2]) if len(args) > 2 else 7
    only = None
    if "--only" in sys.argv:  # re-check a few names in isolation
        only = re.compile(sys.argv[sys.argv.index("--only") + 1])
    a = _run_all(sf_dir, pa, only)
    b = _run_all(sf_dir, pb, only)
    diffs = sorted(n for n in a if a[n] != b.get(n))
    for n in diffs:
        print(f"LAYOUT-DEPENDENT: {n}")
    print(f"diffs: {len(diffs)} of {len(a)} ({pa} vs {pb} partitions, {sf_dir})")
    return 1 if diffs else 0


if __name__ == "__main__":
    sys.exit(main())
