"""The local oracle harness must be at least as strict as the driver's
byte-hashing comparator for every value class a registry query can emit.

Round 7's single driver red (``text_script_mix``) passed four local
307/307 parity sweeps because ``oracle_harness._norm`` compared floats
with Python ``==``, which treats ``-0.0 == 0.0`` as equal while the
driver hashes raw float bytes and does not.  These tests plant exactly
that frame and assert the harness now rejects it — green-by-luck in the
signed-zero class is structurally impossible again.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.oracle_harness import _norm, compare


def test_norm_distinguishes_signed_zeros():
    assert _norm(0.0) != _norm(-0.0)
    assert _norm(0.0) == _norm(0.0)
    assert _norm(-0.0) == _norm(-0.0)
    # the round-7 failure shape: a rounded tiny negative residue
    assert _norm(round(-1e-9, 6)) == _norm(-0.0)
    assert _norm(round(-1e-9, 6)) != _norm(0.0)
    # ordinary values keep the 6-dp tolerance behavior
    assert _norm(1.0000001) == _norm(1.0000004)
    assert _norm(float("nan")) == "NaN"


def test_compare_rejects_planted_signed_zero_frame(spark):
    """A Spark frame emitting +0.0 against an oracle emitting -0.0 must
    FAIL the harness (rows, schema, and numeric values all 'match')."""
    con = duckdb.connect()
    try:
        df = spark.createDataFrame([(1, 0.0)], "id bigint, v double")
        # this DuckDB build folds a literal -0.0 (and even ROUND of a tiny
        # negative) to +0.0; the string cast is the reliable way to plant
        # a true negative zero, matching what the DRIVER's engine emitted
        sql = "SELECT CAST(1 AS BIGINT) AS id, CAST('-0.0' AS DOUBLE) AS v"
        with pytest.raises(AssertionError, match="value mismatch"):
            compare(df, con, sql, "planted-signed-zero")
        # and the genuinely-equal frame still passes
        compare(
            df,
            con,
            "SELECT CAST(1 AS BIGINT) AS id, CAST(0.0 AS DOUBLE) AS v",
            "planted-equal",
        )
    finally:
        con.close()


def test_decimal_div_is_exact_where_floor_of_divide_is_not(spark):
    """Round-9 review regression: Spark's decimal division HALF_UP-rounds
    to scale 6 BEFORE a floor(), so floor((r-1)(N-1)/(n-1)) is off by one
    whenever the exact quotient's fraction is >= .9999995 — e.g.
    19999999/10000001 = 1.9999997 floors to 2 via floor(divide) but `div`
    returns the exact integral quotient 1. quantile_normalize's index map
    must therefore use `div`; this test pins the semantics the fix relies
    on so an engine upgrade cannot silently regress them."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(19999999, 10000001)], "a long, c long")
    r = df.select(
        F.expr(
            "CAST(a AS DECIMAL(38,0)) div CAST(c AS DECIMAL(38,0))"
        ).alias("exact"),
        F.floor(
            F.col("a").cast("decimal(38,0)") / F.col("c").cast("decimal(38,0)")
        ).alias("floored"),
    ).collect()[0]
    assert r["exact"] == 1  # the true integral quotient
    assert r["floored"] == 2  # the documented failure mode of floor(/)
