"""Custom stateful streaming operators (T6/T7): applyInPandasWithState
sessionization — batch parity, cross-batch session stitching, event-time
timeout eviction, ordinal continuity — and watermark-bounded dedup.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from split_kinesis_streams_with_glue_spark.streaming.stateful import (
    FLUSH_EVENT,
    dedup_stream_within_watermark,
    sessionize_stream,
)

EVENT_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _write_chunk(spark, rows, src, mtime):
    df = spark.createDataFrame(rows, EVENT_SCHEMA)
    df.coalesce(1).write.mode("append").json(src)
    for f in os.listdir(src):
        p = os.path.join(src, f)
        if os.path.getmtime(p) > mtime:
            os.utime(p, (mtime, mtime))


def _run(spark, src, out, ckpt, gap_seconds=900, watermark="30 minutes"):
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    q = (
        sessionize_stream(stream, gap_seconds=gap_seconds, watermark=watermark)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out)


def _ts(minute):
    import datetime as dt

    return dt.datetime(2024, 1, 1, 12, 0, 0) + dt.timedelta(minutes=minute)


def test_session_spans_batches(spark, tmp_path):
    """Events 5 min apart across two micro-batches stitch into ONE session;
    a >gap jump starts session 2."""
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ck")
    os.makedirs(src)
    _write_chunk(spark, [(1, _ts(0), 7, "c", 1.0), (2, _ts(5), 7, "c", 2.0)], src, 1_000)
    _write_chunk(spark, [(3, _ts(10), 7, "c", 3.0), (4, _ts(60), 7, "c", 4.0)], src, 2_000)
    _write_chunk(spark, [(-1, _ts(24 * 60), 7, FLUSH_EVENT, 0.0)], src, 3_000)
    rows = {
        (r.session_id): (r.n_events, r.session_start_es, r.session_end_es, r.session_value)
        for r in _run(spark, src, out, ckpt).collect()
    }
    es0 = int(_ts(0).timestamp())
    assert rows[1] == (3, es0, es0 + 600, 6.0)
    assert rows[2] == (1, es0 + 3600, es0 + 3600, 4.0)


def test_timeout_evicts_and_ordinals_survive(spark, tmp_path):
    """User idle past gap while OTHER users advance the watermark: the idle
    session is emitted by event-time timeout (no flush needed for it), and
    the user's next session still gets ordinal 2."""
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ck")
    os.makedirs(src)
    # batch 1: user 7 session; user 9 keeps the clock moving
    _write_chunk(spark, [(1, _ts(0), 7, "c", 1.0), (2, _ts(1), 9, "c", 0.0)], src, 1_000)
    # batch 2: clock way past user 7's gap+watermark → timeout fires for 7
    _write_chunk(spark, [(3, _ts(180), 9, "c", 0.0)], src, 2_000)
    # batch 3: user 7 returns → must be session_id 2
    _write_chunk(spark, [(4, _ts(240), 7, "c", 5.0)], src, 3_000)
    _write_chunk(
        spark,
        [(-1, _ts(48 * 60), 7, FLUSH_EVENT, 0.0), (-1, _ts(48 * 60), 9, FLUSH_EVENT, 0.0)],
        src,
        4_000,
    )
    got = {
        (r.user_id, r.session_id): r.n_events
        for r in _run(spark, src, out, ckpt, watermark="10 minutes").collect()
    }
    assert got[(7, 1)] == 1
    assert got[(7, 2)] == 1
    # user 9: sessions at t=1, t=180 → two sessions
    assert got[(9, 1)] == 1 and got[(9, 2)] == 1


def test_stateful_matches_batch_oracle_shape(spark, sf_dir):
    """Full-table parity with the batch gaps-and-islands query at the unit
    scale factor (the sf0.01 parity runs in the driver harness)."""
    from split_kinesis_streams_with_glue_spark.plans.all import REGISTRY

    a = REGISTRY["events_sessionize_stateful"].fn(spark, sf_dir)
    b = REGISTRY["events_sessionize"].fn(spark, sf_dir)
    cols = ["user_id", "session_id", "n_events", "session_start_es", "session_end_es", "session_value"]
    assert sorted(map(tuple, a.select(cols).collect())) == sorted(
        map(tuple, b.select(cols).collect())
    )


def test_stream_dedup_within_watermark(spark, tmp_path):
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ck")
    os.makedirs(src)
    rows = [(i, _ts(i), 1, "c", float(i)) for i in range(10)]
    _write_chunk(spark, rows + rows, src, 1_000)  # duplicates in-batch
    _write_chunk(spark, rows[:5], src, 2_000)  # duplicates across batches
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    q = (
        dedup_stream_within_watermark(stream, ["event_id"], watermark="2 hours")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    assert got.count() == 10
    assert got.select("event_id").distinct().count() == 10


def test_funnel_order_matters(spark, sf_dir):
    """A user who clicks BEFORE their first view must not count as a
    view->click conversion; in-order users must."""
    import datetime as dt

    from split_kinesis_streams_with_glue_spark.operators.funnel import funnel

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: view then click (converts)
        (1, t0, 1, "view"), (2, t0 + dt.timedelta(minutes=5), 1, "click"),
        # user 2: click then view (step-2 non-converter)
        (3, t0, 2, "click"), (4, t0 + dt.timedelta(minutes=5), 2, "view"),
        # user 3: view only
        (5, t0, 3, "view"),
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string")
    out = {r["event_type"]: r["n_users"] for r in funnel(ev, ["view", "click"]).collect()}
    assert out == {"view": 3, "click": 1}
