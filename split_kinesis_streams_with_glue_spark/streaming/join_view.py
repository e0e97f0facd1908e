"""Incrementally maintained JOIN-view aggregates under CDC.

``make_cdc_rollup_merger`` (cdc_merge.py) keeps a single-table aggregate
exact under updates/deletes. This module extends the same dirty-bucket
decomposition to a JOIN view — the materialized ``dim ⋈ fact`` aggregate
(e.g. revenue per customer segment) staying exact while the dimension
side changes through CDC:

- The fact side is prepared ONCE with ``bucket_copy``: partitioned on
  disk by the SAME key-hash bucket function the CDC merger uses for the
  dimension (``pmod(xxhash64(join_key), num_buckets)``). Equal keys land
  in equal bucket ids on both sides — the co-location that makes
  incremental join maintenance local.
- Per epoch, after the row merge, only the dirty buckets' partials are
  recomputed: the freshly merged dimension rows of those buckets join the
  fact rows of THE SAME bucket partitions (file-listing pruning — clean
  fact buckets are never opened), aggregate to per-(bucket, group)
  partials, and dynamic-overwrite those partial partitions. Retraction is
  implicit: a deleted/updated dimension row simply isn't in the merged
  bucket anymore, so its old join contributions vanish with the rewrite.
- ``read_join_view`` folds the bounded partial table (num_buckets ×
  |groups| rows); the fact table is never rescanned at read time.

Cost per trigger: O(batch + dirty-bucket dim rows + dirty-bucket fact
rows) — independent of total table sizes. The limitation is symmetric
CDC: if the FACT side also streams, both sides need the merger (one per
table, shared bucket function) and the view recomputes buckets dirty on
EITHER side; this module implements the dim-stream/fact-static case and
documents the extension.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from split_kinesis_streams_with_glue_spark.streaming.cdc_merge import (
    make_cdc_merger,
)
from split_kinesis_streams_with_glue_spark.streaming.markers import (
    _fs as _fs_path,
    read_text_marker,
    write_text_marker,
)


def bucket_copy(df: DataFrame, key_col: str, path: str, num_buckets: int) -> None:
    """One-time preparation of the fact side: write ``df`` Hive-partitioned
    by the merger's key-hash bucket of ``key_col``. At 100 TB this is the
    usual one-off layout job (and the same bucketed layout serves every
    view keyed on this column)."""
    df.withColumn(
        "__bucket", F.pmod(F.xxhash64(F.col(key_col)), F.lit(num_buckets))
    ).write.mode("overwrite").partitionBy("__bucket").parquet(path)


def make_cdc_join_view_merger(
    path: str,
    agg_path: str,
    fact_path: str,
    table: str,
    pk_cols: list[str],
    dim_key: str,
    fact_key: str,
    group_cols: list[str],
    value_expr,
    num_buckets: int = 64,
):
    """CDC merger whose ``on_merged`` hook maintains the join-view partial
    table. ``value_expr`` is aggregated with SUM over the joined rows (use
    DECIMAL for engine-exact money math); a COUNT of joined rows rides
    along. The dimension's CDC phases keep the view exact: updates change
    the dim columns ``value_expr``/``group_cols`` read, deletes remove all
    of a key's joined contributions.

    The dim table is bucketed by ``dim_key`` (NOT by the pk): the fact
    side was laid out by ``pmod(xxhash64(fact_key), n)``, so the dirty-
    bucket fact filter is only correct when the dim side buckets by the
    JOIN key with the same function — with pk bucketing, any composite pk
    (or a join on a non-pk column) would prune the WRONG fact partitions
    and silently corrupt the partials. ``xxhash64`` is type-sensitive:
    ``dim_key`` and ``fact_key`` must have identical types on both sides
    (cast before ``bucket_copy`` if they differ)."""

    def on_merged(merged: DataFrame, dirty_ids: set, surviving: set) -> None:
        spark = merged.sparkSession
        dirty = [int(b) for b in dirty_ids]
        dim = merged.filter(F.col("operation") != "delete").withColumnRenamed(
            "__bucket", "__dim_bucket"
        )
        facts = spark.read.parquet(fact_path).filter(F.col("__bucket").isin(dirty))
        # alias both sides: with unaliased frames a shared key name (the
        # common case — e.g. customer_id on both tables) makes
        # F.col(dim_key) ambiguous and the merge raises AnalysisException
        joined = dim.alias("d").join(
            facts.alias("f"), F.col(f"d.{dim_key}") == F.col(f"f.{fact_key}")
        )
        partials = joined.groupBy(
            F.col("__dim_bucket").alias("__bucket"), *group_cols
        ).agg(F.count(F.lit(1)).alias("n"), F.sum(value_expr).alias("total"))
        # the present-bucket census rides the write as an observed metric
        # (<= num_buckets values) instead of re-running the join+aggregate
        # for a separate collect (r14, as in make_cdc_merger)
        obs = Observation(f"join-view-present-{table}")
        partials_schema = partials.schema
        observed = partials.observe(obs, F.collect_set("__bucket").alias("buckets"))
        observed.write.mode("overwrite").partitionBy("__bucket").parquet(agg_path)
        write_text_marker(spark, f"{agg_path}/_schema", partials_schema.json())
        # dirty buckets whose dim rows vanished (or join to nothing) leave
        # no partial rows; drop their stale partitions
        present = {int(b) for b in obs.get["buckets"]}
        for bucket in sorted(set(dirty) - present):
            fs, part, _ = _fs_path(spark, f"{agg_path}/__bucket={bucket}")
            if fs.exists(part):
                fs.delete(part, True)

    return make_cdc_merger(
        path, table, pk_cols, num_buckets,
        on_merged=on_merged, bucket_cols=[dim_key],
    )


def read_join_view(spark, agg_path: str, group_cols: list[str]) -> DataFrame:
    """The user-facing join aggregate: fold the per-bucket partials
    (bounded by num_buckets × |groups| — the fact table is never
    rescanned). Sidecar-first like ``read_table`` — no inference job."""
    schema_json = read_text_marker(spark, f"{agg_path}/_schema")
    if schema_json is not None:
        partials = spark.read.schema(
            StructType.fromJson(json.loads(schema_json))
        ).parquet(agg_path)
    else:
        partials = spark.read.parquet(agg_path)
    return partials.groupBy(*group_cols).agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("total").alias("total"),
    )


def make_symmetric_join_view_mergers(
    left_path: str,
    right_path: str,
    agg_path: str,
    left_table: str,
    right_table: str,
    left_pk: list[str],
    right_pk: list[str],
    left_key: str,
    right_key: str,
    group_cols: list[str],
    value_expr,
    num_buckets: int = 64,
):
    """BOTH sides streaming: two CDC mergers sharing one bucket function
    (each bucketed by its JOIN key — immutable per row, see
    ``make_cdc_merger``'s ``bucket_cols`` contract) and one view updater.
    Whichever side merges, the view recomputes partials for the buckets
    THAT epoch dirtied, joining the two materialized tables' rows of
    those buckets only (both reads prune at the file listing). Clean
    buckets' partials stay exactly valid because neither side's rows in
    them changed — the co-bucketing invariant. Returns
    ``(left_merge, right_merge)``; read with ``read_join_view``.

    Cost per trigger on either stream: O(batch + dirty-bucket rows of
    BOTH tables) — still independent of total table sizes.

    Single-writer discipline: the two mergers share the partial table, so
    their triggers must not run CONCURRENTLY (a hook reading the other
    side mid-write could recompute a bucket from a half-merged state).
    Sequential availableNow drains (the tested mode) satisfy this; for
    two live processingTime streams, serialize the foreachBatch bodies
    (same driver lock or alternating triggers)."""
    from pyspark.errors import AnalysisException

    def _side(spark, path, dirty):
        try:
            # sidecar-first (the row tables are merger-maintained, so the
            # sidecar exists after any epoch): no inference footer sweep
            schema_json = read_text_marker(spark, f"{path}/_schema")
            if schema_json is not None:
                df = spark.read.schema(
                    StructType.fromJson(json.loads(schema_json))
                ).parquet(path)
            else:
                df = spark.read.option("mergeSchema", "true").parquet(path)
        except AnalysisException:
            return None  # that side has seen no epoch yet
        df = df.filter(F.col("__bucket").isin(dirty))
        if "operation" in df.columns:
            df = df.filter(F.col("operation") != "delete")
        return df

    def update_view(spark, dirty_ids: set) -> None:
        dirty = [int(b) for b in dirty_ids]
        left = _side(spark, left_path, dirty)
        right = _side(spark, right_path, dirty)
        if left is None or right is None:
            empty_sweep = dirty
            partials = None
        else:
            l = left.withColumnRenamed("__bucket", "__b").drop(
                "timestamp", "operation"
            )
            r = right.drop("__bucket", "timestamp", "operation")
            # qualified join condition: when left_key == right_key (the
            # common case) an unaliased F.col(key) == F.col(key) is
            # ambiguous and raises at merge time
            joined = l.alias("l").join(
                r.alias("r"), F.col(f"l.{left_key}") == F.col(f"r.{right_key}")
            )
            partials = joined.groupBy(
                F.col("__b").alias("__bucket"), *group_cols
            ).agg(F.count(F.lit(1)).alias("n"), F.sum(value_expr).alias("total"))
            obs = Observation(f"sym-view-present-{left_table}-{right_table}")
            partials_schema = partials.schema
            observed = partials.observe(
                obs, F.collect_set("__bucket").alias("buckets")
            )
            observed.write.mode("overwrite").partitionBy("__bucket").parquet(
                agg_path
            )
            write_text_marker(spark, f"{agg_path}/_schema", partials_schema.json())
            present = {int(b) for b in obs.get["buckets"]}
            empty_sweep = sorted(set(dirty) - present)
        for bucket in empty_sweep:
            fs, part, _ = _fs_path(spark, f"{agg_path}/__bucket={bucket}")
            if fs.exists(part):
                fs.delete(part, True)

    def hook(merged: DataFrame, dirty_ids: set, surviving: set) -> None:
        update_view(merged.sparkSession, dirty_ids)

    left_merge = make_cdc_merger(
        left_path, left_table, left_pk, num_buckets,
        on_merged=hook, bucket_cols=[left_key],
    )
    right_merge = make_cdc_merger(
        right_path, right_table, right_pk, num_buckets,
        on_merged=hook, bucket_cols=[right_key],
    )
    return left_merge, right_merge


def join_view_stream(
    stream: DataFrame,
    path: str,
    agg_path: str,
    fact_path: str,
    checkpoint: str,
    table: str,
    pk_cols: list[str],
    dim_key: str,
    fact_key: str,
    group_cols: list[str],
    value_expr,
    num_buckets: int = 64,
):
    """Run the join-view merger as a Structured Streaming sink
    (availableNow drain; same foreachBatch replay contract as
    cdc_merge_stream). Returns the started StreamingQuery."""
    merge = make_cdc_join_view_merger(
        path, agg_path, fact_path, table, pk_cols,
        dim_key, fact_key, group_cols, value_expr, num_buckets,
    )
    return (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
