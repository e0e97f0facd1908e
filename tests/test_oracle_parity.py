"""Every registered query with an oracle must match DuckDB at sf0.01 —
the same comparison the driver's correctness gate runs."""

from __future__ import annotations

import os

import pytest

from tests.oracle_harness import assert_driver_safe_schema, compare, duckdb_conn

PARITY_SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF_DIR", "/root/testdata/sf0.01")


def _registry():
    from split_kinesis_streams_with_glue_spark.plans import all_queries

    return all_queries()


def _window():
    """The 50 registry slots the driver hash-verifies this round."""
    from split_kinesis_streams_with_glue_spark.plans import all_queries

    return set(list(all_queries())[:50])


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(PARITY_SF_DIR)
    yield c
    c.close()


# Default runs cover exactly what the driver's correctness gate covers (the
# 50-slot window); the registry-wide sweep is full-gate-only (FULL_GATES=1)
# because 367 Spark+DuckDB comparisons blow the driver's pytest budget
# (VERDICT r13 item 2).
@pytest.mark.parametrize(
    "name",
    [
        n if n in _window() else pytest.param(n, marks=pytest.mark.slow)
        for n in sorted(_registry())
    ],
)
def test_oracle_parity(spark, con, name):
    spec = _registry()[name]
    df = spec.fn(spark, PARITY_SF_DIR)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check, like the driver's
        return
    # covers the side-effecting queries test_output_schemas.py skips
    assert_driver_safe_schema(df.schema, name)
    compare(df, con, spec.oracle, name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["c_mktsegment", "n_customers", "total_acctbal"]


def test_contract_shapes():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert all(callable(f) for f in q.values())
