"""Continuous aggregate maintenance ("hypertable rollup"): keep a
time-bucketed aggregate table incrementally up to date as an append-only
stream arrives.

Per micro-batch: partial-aggregate the batch by (bucket, keys), merge with
the stored aggregate rows OF THE TOUCHED BUCKETS ONLY, and rewrite exactly
those bucket partitions (``partitionOverwriteMode=dynamic``). At scale the
cost per trigger is O(batch + dirty-bucket rows), independent of the total
history size — the property that makes a rollup usable on an unbounded
stream. Counts and sums merge associatively, so partial agg + merge is
exact regardless of how rows split across micro-batches.

Replay safety: foreachBatch is at-least-once — after a failure the same
epoch is re-delivered, and naively re-merging it would double-count. The
merger records the last applied epoch in ``_last_epoch`` under the output
path (underscore-prefixed, so readers ignore it) and skips epochs it has
already applied. The marker write follows the data write, so a crash
between the two re-merges at most the one epoch whose write already
succeeded — the standard best-effort contract of a non-transactional sink.
The (path, checkpoint) pair must be kept together: a fresh checkpoint over
an existing output restarts epoch numbering and the guard would skip real
batches.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from split_kinesis_streams_with_glue_spark.streaming.markers import (
    read_marker,
    write_marker,
)


def make_merger(
    path: str,
    bucket_expr=None,
    keys: list[str] | None = None,
    value_col: str = "value",
):
    """Build the idempotent (batch, epoch_id) -> None merge function used by
    ``continuous_rollup`` (exposed for direct testing of replay behavior)."""
    bucket = bucket_expr if bucket_expr is not None else F.to_date("ts")
    keys = keys or ["event_type"]
    epoch_marker = f"{path}/_last_epoch"

    def merge(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        last = read_marker(spark, epoch_marker)
        if last is not None and epoch_id <= last:
            return  # replayed epoch — already applied
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        delta = batch.groupBy(bucket.alias("bucket"), *keys).agg(
            F.count(F.lit(1)).alias("n"), F.sum(value_col).alias("total")
        )
        try:
            old = spark.read.parquet(path)
            # only the buckets this batch touches participate in the merge;
            # untouched partitions are left on disk as-is (dynamic overwrite)
            dirty = delta.select("bucket").distinct()
            merged = (
                old.join(F.broadcast(dirty), "bucket")
                .unionByName(delta)
                .groupBy("bucket", *keys)
                .agg(F.sum("n").alias("n"), F.sum("total").alias("total"))
            )
        except AnalysisException:
            # PATH_NOT_FOUND / UNABLE_TO_INFER_SCHEMA: genuinely the first
            # batch. Anything else (transient IO, corrupt file) must FAIL
            # the batch so the stream retries — falling back to delta-only
            # here would dynamic-overwrite touched buckets with the delta
            # alone, silently discarding their accumulated history.
            merged = delta
        merged.write.mode("overwrite").partitionBy("bucket").parquet(path)
        write_marker(spark, epoch_marker, epoch_id)

    return merge


def continuous_rollup(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    bucket_expr=None,
    keys: list[str] | None = None,
    value_col: str = "value",
):
    """Maintain (bucket, *keys) -> (n, total) under ``path``; returns the
    started StreamingQuery. ``bucket_expr`` defaults to the event date."""
    merge = make_merger(path, bucket_expr, keys, value_col)
    return (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
