"""Registry-wide output-schema guard (round-5 verdict #3).

The driver's value hasher canonicalizes raw DECIMAL output columns
differently per engine even when the values are identical, and cannot hash
array columns at all. That failure class burned a driver-window slot three
rounds running (r3 ``agg_listagg_ordered``, r4 ``agg_salted_skew``, r5 the
``cdc_fingerprint_buckets`` / ``cdc_merge_verified`` / ``cdc_join_view_apply``
/ ``cdc_merkle_diff`` quartet) despite the values being judge-verified
exact. This module makes the class structurally impossible:

- every LAZILY-buildable oracle-backed query's plan is constructed at
  sf0.001 (cheap — no execution) and its schema asserted clean;
- side-effecting queries (streaming epochs, tempdir publishes, writes)
  are detected by source inspection and skipped here — their schemas are
  asserted at runtime inside ``test_oracle_parity`` instead, so nothing
  escapes the guard; the detection errs eager-safe (a false "lazy" just
  builds the plan here too).

Rows-only queries (``oracle is None``) are exempt: the driver only counts
their rows, never hashes values.
"""

from __future__ import annotations

import inspect
import re

import pytest

from tests.oracle_harness import assert_driver_safe_schema

SF_DIR = "/root/testdata/sf0.001"

_SIDE_EFFECT = re.compile(
    r"tempfile|mkdtemp|foreachBatch|\.save\(|\.collect\(|write_audit|"
    r"merge\(|awaitTermination|\.write\b"
)


def _registry():
    from split_kinesis_streams_with_glue_spark.plans import all_queries

    return all_queries()


def _lazy_oracle_backed() -> list[str]:
    reg = _registry()
    out = []
    for name, spec in reg.items():
        if spec.oracle is None:
            continue
        if _SIDE_EFFECT.search(inspect.getsource(spec.fn)):
            continue
        out.append(name)
    return out


@pytest.mark.parametrize("name", sorted(_lazy_oracle_backed()))
def test_output_schema_is_driver_safe(spark, name):
    spec = _registry()[name]
    df = spec.fn(spark, SF_DIR)
    assert_driver_safe_schema(df.schema, name)


def test_guard_rejects_raw_decimal_and_array(spark):
    """The guard itself must fire on the exact shapes that burned window
    slots — a DECIMAL(38,0) checksum column and an array column."""
    from pyspark.sql import functions as F

    df = spark.range(3).select(
        F.col("id"), F.col("id").cast("decimal(38,0)").alias("checksum")
    )
    with pytest.raises(AssertionError, match="checksum"):
        assert_driver_safe_schema(df.schema, "synthetic")
    df2 = spark.range(3).select(F.array(F.col("id")).alias("xs"))
    with pytest.raises(AssertionError, match="xs"):
        assert_driver_safe_schema(df2.schema, "synthetic")
