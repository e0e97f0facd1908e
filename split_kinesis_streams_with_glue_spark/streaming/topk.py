"""Streaming top-k (space-saving summary) maintained across micro-batches.

"Which keys are the heaviest, ever, over an unbounded stream" cannot be
answered by windowed aggregation (state grows with distinct keys) or by the
CMS alone (it answers point queries, not "which keys"). The space-saving
summary (Metwally et al. 2005; merge rules per Agarwal et al., Mergeable
Summaries, 2013) keeps a FIXED ``capacity`` of (key, cnt, err) rows with
the classic guarantees: estimates never undercount, every key whose true
count exceeds N/capacity is present, and est - true <= the admission
threshold recorded alongside.

Batch-merge form (foreachBatch, same replay contract as rollup/cdc_merge):
per trigger the batch's exact per-key counts fold into the stored summary —
keys already present add their counts; new keys are admitted at the current
threshold (the count mass they could have accumulated while evicted, which
is exactly their ``err``); the summary is cut back to the top ``capacity``
rows and the threshold advances to the minimum surviving count once full.
All DataFrame ops; the summary table is ``capacity`` rows forever, the
per-trigger cost is O(batch + capacity).
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from split_kinesis_streams_with_glue_spark.streaming.markers import (
    read_marker,
    write_marker,
)


def make_topk_merger(path: str, key_col: str, capacity: int = 256):
    """Idempotent ``(batch, epoch_id) -> None``: fold the batch into the
    stored summary under ``path``. Exposed for direct replay testing."""
    epoch_marker = f"{path}/_last_epoch"
    thresh_marker = f"{path}/_threshold"

    def merge(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        last = read_marker(spark, epoch_marker)
        if last is not None and epoch_id <= last:
            return  # replayed epoch — already applied
        thresh = read_marker(spark, thresh_marker) or 0
        delta = batch.groupBy(F.col(key_col).alias("key")).agg(
            F.count(F.lit(1)).alias("__d_cnt")
        )
        stored = None
        try:
            stored = spark.read.parquet(f"{path}/summary")
        except AnalysisException as exc:
            cond = (
                exc.getCondition()
                if hasattr(exc, "getCondition")
                else exc.getErrorClass()
            )
            if cond not in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"):
                raise
        if stored is None:
            pool = delta.select(
                "key",
                (F.col("__d_cnt") + F.lit(thresh)).alias("cnt"),
                F.lit(thresh).cast("bigint").alias("err"),
            )
        else:
            j = stored.join(delta, "key", "full_outer")
            pool = j.select(
                "key",
                (
                    F.coalesce(F.col("cnt"), F.lit(thresh))
                    + F.coalesce(F.col("__d_cnt"), F.lit(0))
                ).alias("cnt"),
                F.coalesce(F.col("err"), F.lit(thresh)).cast("bigint").alias("err"),
            )
        # top-`capacity` by count (ties by key for determinism); capacity is
        # small, so this is a TakeOrdered, not a global sort
        kept = pool.orderBy(F.col("cnt").desc(), F.col("key")).limit(capacity)
        # bounded collect (`capacity` rows by construction): also severs the
        # lineage to the stored summary, so the overwrite below does not
        # read the very files it is replacing
        rows = kept.collect()
        spark.createDataFrame(rows, kept.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{path}/summary")
        if len(rows) >= capacity:
            new_thresh = min(r["cnt"] for r in rows)
            write_marker(spark, thresh_marker, max(thresh, int(new_thresh)))
        write_marker(spark, epoch_marker, epoch_id)

    return merge


def stream_topk(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    key_col: str,
    capacity: int = 256,
):
    """Maintain the summary from a streaming frame; returns the started
    StreamingQuery."""
    merge = make_topk_merger(path, key_col, capacity)
    return (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_topk(spark, path: str, k: int | None = None) -> DataFrame:
    """The current summary: (key, cnt, err), heaviest first. ``cnt`` never
    undercounts the true total; ``cnt - err`` never overcounts it."""
    df = spark.read.parquet(f"{path}/summary").orderBy(
        F.col("cnt").desc(), F.col("key")
    )
    return df.limit(k) if k is not None else df
