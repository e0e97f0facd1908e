"""asof_join semantics: latest right row at-or-before each left row, NULL
when none qualifies, struct-consistent payload when columns are NULL."""

from __future__ import annotations

from split_kinesis_streams_with_glue_spark.operators.asof import asof_join


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_basic_and_no_match(spark):
    left = _df(spark, [(1, 10.0, "a"), (1, 20.0, "b"), (2, 5.0, "c")],
               "k long, t double, lbl string")
    right = _df(spark, [(1, 9.0, 100), (1, 15.0, 200), (2, 6.0, 300)],
                "k long, t double, v long")
    out = {r["lbl"]: r["v_asof"] for r in
           asof_join(left, right, on="k", left_ts="t", right_ts="t").collect()}
    assert out == {"a": 100, "b": 200, "c": None}


def test_asof_tie_is_inclusive(spark):
    left = _df(spark, [(1, 10.0, "x")], "k long, t double, lbl string")
    right = _df(spark, [(1, 10.0, 7)], "k long, t double, v long")
    row = asof_join(left, right, on="k", left_ts="t", right_ts="t").collect()[0]
    assert row["v_asof"] == 7


def test_asof_payload_struct_consistency(spark):
    """A right row with a NULL payload column must NOT inherit that column
    from an older right row."""
    left = _df(spark, [(1, 30.0, "x")], "k long, t double, lbl string")
    right = _df(spark, [(1, 10.0, 1, "old"), (1, 20.0, 2, None)],
                "k long, t double, v long, tag string")
    row = asof_join(left, right, on="k", left_ts="t", right_ts="t").collect()[0]
    assert row["v_asof"] == 2 and row["tag_asof"] is None
