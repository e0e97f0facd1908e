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
