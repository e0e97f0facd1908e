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
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    bucket = bucket_expr if bucket_expr is not None else F.to_date("ts")
    keys = keys or ["event_type"]

    def merge(batch: DataFrame, _epoch: int) -> None:
        spark = batch.sparkSession
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
        except Exception:
            merged = delta
        merged.write.mode("overwrite").partitionBy("bucket").parquet(path)

    return (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
