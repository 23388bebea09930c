"""Oracle-parity tests: every registered query with oracle SQL is compared
against DuckDB on the same parquet — the local mirror of the driver's t2
gate (exact value equality, stricter than the hash)."""

from __future__ import annotations

import pytest

from modforms_db_spark.registry import get_registry

from tests.conftest import assert_parity


def _oracle_names() -> list[str]:
    return sorted(n for n, qd in get_registry().items() if qd.oracle is not None)


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_parity(spark, ddb, name):
    assert_parity(spark, ddb, name)


def _rows_only_names() -> list[str]:
    return sorted(n for n, qd in get_registry().items() if qd.oracle is None)


@pytest.mark.parametrize("name", _rows_only_names())
def test_rows_only_runs(spark, name):
    """Rows-only queries must at least run and return a stable schema."""
    from tests.conftest import SF_DIR

    df = get_registry()[name].builder(spark, SF_DIR)
    assert df.columns  # non-empty schema
    df.collect()  # executes without error
