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


def test_point_in_time_join_expiry_and_precreation(spark):
    """Hand-checked SCD2 probing: mid-validity probes see that version,
    probes after a closing delete are NULL (no resurrection), probes
    before the entity existed are NULL (no leakage)."""
    import datetime as dt

    from split_kinesis_streams_with_glue_spark.operators.asof import (
        point_in_time_join,
    )

    t = lambda m: dt.datetime(2024, 1, 1, 0, m, 0)  # noqa: E731
    hist = spark.createDataFrame(
        [
            ("k1", 10.0, t(10), t(20)),
            ("k1", 11.0, t(20), t(30)),  # delete closes history at t30
            ("k2", 5.0, t(0), None),  # still current
        ],
        ["k", "val", "valid_from", "valid_to"],
    )
    facts = spark.createDataFrame(
        [
            (1, "k1", t(5)),   # before creation -> NULL
            (2, "k1", t(15)),  # first version
            (3, "k1", t(20)),  # boundary: second version ([from, to))
            (4, "k1", t(35)),  # after delete -> NULL
            (5, "k2", t(59)),  # open-ended current version
            (6, "k3", t(1)),   # unknown key -> NULL
        ],
        ["fid", "k", "ts"],
    )
    out = {
        r["fid"]: r["val_pit"]
        for r in point_in_time_join(facts, hist, on="k", ts_col="ts").collect()
    }
    assert out == {1: None, 2: 10.0, 3: 11.0, 4: None, 5: 5.0, 6: None}


def test_asof_nearest_directions_tolerance_and_tie(spark):
    """Hand-built series: backward pick, forward pick, out-of-tolerance
    NULL, and an exact-distance tie resolving backward."""
    import datetime as dt

    from split_kinesis_streams_with_glue_spark.operators.asof import asof_nearest

    def t(s):
        return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)

    left = spark.createDataFrame(
        [
            (1, "k", t(100)),  # nearest right: 95 (backward, d=5) vs 110 (d=10)
            (2, "k", t(108)),  # nearest right: 110 (forward, d=2)
            (3, "k", t(300)),  # nothing within 60s -> NULL
            (4, "k", t(200)),  # tie: 195 and 205 both d=5 -> backward wins
        ],
        "id int, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("k", t(95), 9.5), ("k", t(110), 11.0), ("k", t(195), 19.5), ("k", t(205), 20.5)],
        "k string, ts timestamp, v double",
    )
    got = {
        r["id"]: r
        for r in asof_nearest(
            left, right, on="k", left_ts="ts", right_ts="ts",
            tolerance_seconds=60, right_cols=["v"],
        ).collect()
    }
    assert got[1]["v_near"] == 9.5 and got[1]["distance_us_near"] == 5_000_000
    assert got[2]["v_near"] == 11.0 and got[2]["distance_us_near"] == 2_000_000
    assert got[3]["v_near"] is None and got[3]["distance_us_near"] is None
    assert got[4]["v_near"] == 19.5  # backward wins the exact tie


def test_asof_nearest_equal_time_right_qualifies_backward(spark):
    """A right row at EXACTLY the left timestamp is a distance-0 backward
    match (the <= tie convention asof_join documents), not a miss."""
    import datetime as dt

    from split_kinesis_streams_with_glue_spark.operators.asof import asof_nearest

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame([(1, "k", t0)], "id int, k string, ts timestamp")
    right = spark.createDataFrame(
        [("k", t0, 42.0)], "k string, ts timestamp, v double"
    )
    got = asof_nearest(
        left, right, on="k", left_ts="ts", right_ts="ts",
        tolerance_seconds=1, right_cols=["v"],
    ).collect()[0]
    assert got["v_near"] == 42.0 and got["distance_us_near"] == 0
