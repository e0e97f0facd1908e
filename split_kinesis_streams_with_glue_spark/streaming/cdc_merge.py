"""Incremental CDC merge-apply: a MERGE-INTO for plain Parquet tables.

``compact`` (operators/compact.py) materializes latest-row-per-key from a
FULL change history — fine for backfills, wrong for a live table: at 100 TB
you cannot re-window the whole history per micro-batch. This operator keeps
the materialized table incrementally up to date: per batch it touches only
the key-hash buckets the batch's keys land in, merges the stored rows of
those buckets with the batch delta, and dynamic-overwrites exactly those
bucket partitions. Cost per trigger is O(batch + dirty-bucket rows),
independent of total table size — the property that makes CDC apply usable
on an unbounded stream (the reference's envelopes carry
``metadata.operation`` for exactly this; reference README.md:205, the demo
defers the apply to consumers).

Scale notes:

- ``num_buckets`` bounds rewrite amplification: a batch whose keys hit k
  buckets rewrites ~k/num_buckets of the table. Size it so one bucket ≈
  one comfortable task (100 TB table, 4096 buckets → ~25 GB buckets; CDC
  key locality — hot rows are recent rows — keeps k small in practice).
- Uniform hash bucketing means a pathological batch can touch every
  bucket; that degrades to a full rewrite, never to wrong results. The
  production escape hatch at that point is a merge-on-read table format
  (Delta/Iceberg/Hudi); this operator is the format-free equivalent for
  plain Parquet.
- Ordered mode (default) requires per-key ordered delivery across batches
  — which the reference's pipeline provides (Kinesis partition key =
  primary key, README.md:216). Same-batch ties resolve by event time then
  operation rank (delete wins), via ``compact``. ``out_of_order=True``
  drops that delivery requirement: winning deletes are retained as
  TOMBSTONES (event time + operation kept in the stored rows), so a
  late-arriving older change loses against the tombstone instead of
  resurrecting the row; reads filter tombstones out. Tombstones accumulate
  until ``expire_tombstones`` rewrites (only) the buckets holding ones
  older than a chosen safety horizon — the usual watermark-style bound on
  how late a change may arrive.
- Replay safety: foreachBatch is at-least-once, so the merger records the
  last applied epoch in a ``_last_epoch`` marker (Hadoop FS, atomic
  temp+rename — streaming/markers.py) and skips epochs already applied.
  The merge itself is also idempotent (same input ⇒ same winners), so the
  marker only saves wasted work on the non-crash path; the crash window
  between data write and marker write re-merges one epoch harmlessly.
"""

from __future__ import annotations

import json

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from split_kinesis_streams_with_glue_spark.operators.compact import (
    compact,
    event_time,
    scd2_history,
)
from split_kinesis_streams_with_glue_spark.operators.split import split_one
from split_kinesis_streams_with_glue_spark.streaming.markers import (
    _fs as _fs_path,
    read_marker,
    read_text_marker,
    write_marker,
    write_text_marker,
)

META_COLS = ("timestamp", "operation", "__bucket")


def make_cdc_merger(
    path: str,
    table: str,
    pk_cols: list[str],
    num_buckets: int = 64,
    on_merged=None,
    compat_policy: set[str] | None = None,
    out_of_order: bool = False,
    bucket_cols: list[str] | None = None,
):
    """Build the idempotent ``(envelope_batch, epoch_id) -> None`` merge
    function (exposed for direct replay testing, as rollup's is).

    ``bucket_cols`` (default: the pk) chooses the key-hash bucketing
    columns — set it to a JOIN key (e.g. the fact table's foreign key) so
    derived join-view state (streaming/join_view.py) is co-located with
    the other side. The chosen columns must be IMMUTABLE per pk (true of
    pks and of foreign keys in practice): if an update could move a row
    between buckets, its old version would be stranded in the old bucket.

    ``on_merged(merged, dirty_ids, surviving)`` runs after the row table is
    written but BEFORE the epoch marker commits — derived state (e.g. the
    partial-aggregate table of ``make_cdc_rollup_merger``) therefore shares
    the merge's replay contract: a crash between the two re-runs one epoch,
    and both writes are idempotent recomputations of the same dirty
    buckets.

    ``compat_policy``: optional schema-drift gate (schema/compat.py) —
    e.g. ``{"full", "backward"}`` lets additive/widening drift through and
    FAILS the batch on anything else, BEFORE any file is written (the
    stream retries; a human widens the policy or fixes the producer).
    ``None`` keeps the mechanical tolerance (mergeSchema + null-fill)."""
    marker = f"{path}/_last_epoch"

    def merge(env_batch: DataFrame, epoch_id: int) -> None:
        spark = env_batch.sparkSession
        last = read_marker(spark, marker)
        if last is not None and epoch_id <= last:
            return  # replayed epoch — already applied
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # prune=False: batch-local all-null column pruning would make the
        # stored schema depend on which batch wrote first
        rows = event_time(
            split_one(env_batch, table, keep_operation=True, prune=False)
        )
        delta = rows.withColumn(
            "__bucket",
            F.pmod(
                F.xxhash64(*[F.col(c) for c in (bucket_cols or pk_cols)]),
                F.lit(num_buckets),
            ),
        )
        stored = None
        try:
            # Prefer the _schema sidecar over mergeSchema inference: the
            # sidecar records the last epoch's merged schema, which is the
            # UNION of every column ever written (merge schemas never
            # shrink), so an explicit-schema read sees exactly what
            # mergeSchema would — without the per-epoch footer sweep over
            # every file of the table (a full file-listing job at scale).
            # Buckets written before a drift lack the newer columns and
            # null-fill; a crashed epoch's files written AFTER a drift but
            # before the sidecar update lose the new column only for this
            # replay, which rewrites those same dirty buckets from the
            # replayed delta — convergent either way. Tables from before
            # the sidecar existed fall back to mergeSchema.
            schema_json = read_text_marker(spark, f"{path}/_schema")
            if schema_json is not None:
                stored = spark.read.schema(
                    StructType.fromJson(json.loads(schema_json))
                ).parquet(path)
            else:
                stored = spark.read.option("mergeSchema", "true").parquet(path)
        except AnalysisException as exc:
            # Only a genuinely-absent table is a first batch. Any OTHER
            # analysis error (e.g. incompatible type drift) must fail the
            # batch so the stream retries — falling back to pool = delta
            # would dynamic-overwrite every dirty bucket with the delta
            # alone, silently dropping their stored rows.
            cond = (
                exc.getCondition()
                if hasattr(exc, "getCondition")
                else exc.getErrorClass()
            )
            if cond not in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"):
                raise
        if stored is not None and compat_policy is not None:
            from pyspark.sql.types import StructType as _ST

            from split_kinesis_streams_with_glue_spark.schema.compat import (
                compatibility,
            )

            # classify the PAYLOAD only: the merge's bookkeeping columns
            # (event time, operation, bucket) are engine artifacts whose
            # types/nullability vary by code path, not producer drift
            def _payload(schema):
                return _ST([f for f in schema.fields if f.name not in META_COLS])

            verdict = compatibility(_payload(stored.schema), _payload(delta.schema))
            if verdict not in compat_policy:
                raise ValueError(
                    f"schema drift verdict '{verdict}' not in allowed "
                    f"policy {sorted(compat_policy)} for table {table!r} "
                    f"(epoch {epoch_id}); batch failed before any write"
                )
        # Pin the batch once: the dirty census below AND the merge pool both
        # consume delta — unpinned, the batch source is evaluated (and on the
        # streaming path, its files re-read) twice per epoch. Bounded by
        # construction: delta is one micro-batch. Pinned AFTER the
        # compat_policy gate, which needs only delta.schema (no job), so a
        # rejected batch pays no materialization on each retry. Caveat:
        # localCheckpoint blocks are non-replicated — executor loss
        # mid-epoch fails the batch instead of recomputing it (the stream
        # retry covers it; acceptable for one micro-batch of work).
        delta = delta.localCheckpoint(eager=True)
        # The dirty-bucket census drives the stored-side scan, the emptied-
        # bucket sweep, and on_merged — derive it ONCE (metadata-sized:
        # ≤ num_buckets rows).
        dirty_ids = {r[0] for r in delta.select("__bucket").distinct().collect()}
        if stored is None:
            pool = delta
        else:
            # only buckets this batch touches participate; untouched
            # partitions stay on disk as-is (dynamic overwrite). isin over
            # the partition column beats a broadcast join here: __bucket is
            # the Hive partition key, so the predicate prunes at the file
            # listing — the scan never opens untouched buckets.
            # allowMissingColumns: a column added (or dropped) mid-stream
            # null-fills on the side that lacks it instead of being dropped
            pool = stored.filter(
                F.col("__bucket").isin([int(b) for b in dirty_ids])
            ).unionByName(delta, allowMissingColumns=True)
        # The parquet write below IS the materialization of the merge —
        # write FIRST and let every later consumer (the emptied-bucket
        # sweep's census, on_merged) read the written files back instead of
        # paying a localCheckpoint of the whole merged pool per epoch
        # (r14: one full extra materialization removed; jobs/epoch 11 -> 7,
        # outputs byte-identical).
        merged = compact(pool, pk_cols, drop_meta=False, keep_deletes=out_of_order)
        merged_schema = merged.schema
        # The surviving-bucket census rides the write itself as an observed
        # metric (collect_set over <= num_buckets values) — no separate job.
        obs = Observation(f"cdc-surviving-{table}-{epoch_id}")
        observed = merged.observe(obs, F.collect_set("__bucket").alias("buckets"))
        observed.write.mode("overwrite").partitionBy("__bucket").parquet(path)
        # Dynamic overwrite only replaces partitions PRESENT in the output:
        # a batch whose deletes empty an entire dirty bucket emits no rows
        # for it, so its stale __bucket=N directory would survive on disk
        # and the deleted rows would resurrect in read_table. Drop those
        # emptied partitions explicitly (the observed census is
        # metadata-sized: ≤ num_buckets values).
        surviving = {int(b) for b in obs.get["buckets"]}
        for bucket in sorted(dirty_ids - surviving):
            fs, part, _ = _fs_path(spark, f"{path}/__bucket={bucket}")
            fs.delete(part, True)
        # Schema sidecar: if deletes empty the WHOLE table there are no data
        # files left to infer a schema from; read_table falls back to this
        # marker so an empty table reads as 0 rows with the last schema.
        write_text_marker(spark, f"{path}/_schema", merged_schema.json())
        if on_merged is not None:
            # Derived-state writers see this epoch's merged rows by reading
            # back exactly the dirty buckets just written (partition-pruned,
            # column-prunable — cheaper than holding the full-width
            # checkpoint), with the explicit schema so the __bucket
            # partition column keeps its written type.
            if surviving:
                back = (
                    spark.read.schema(merged_schema)
                    .parquet(path)
                    .filter(F.col("__bucket").isin([int(b) for b in dirty_ids]))
                )
            else:
                back = spark.createDataFrame([], merged_schema)
            on_merged(back, dirty_ids, surviving)
        write_marker(spark, marker, epoch_id)

    return merge


def cdc_merge_stream(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    table: str,
    pk_cols: list[str],
    num_buckets: int = 64,
    out_of_order: bool = False,
):
    """Maintain the latest-row-per-key table for ``table`` under ``path``
    from an envelope stream; returns the started StreamingQuery."""
    merge = make_cdc_merger(path, table, pk_cols, num_buckets, out_of_order=out_of_order)
    return (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_table(spark, path: str) -> DataFrame:
    """The user-facing materialized table (merge bookkeeping columns
    dropped). The ``_schema`` sidecar (recorded by the merger after every
    data write) is the preferred schema source: it equals what mergeSchema
    would infer (merge schemas only ever grow) without the footer sweep
    over every file, and it also covers a table whose rows were ALL
    deleted (no data files to infer from). Pre-sidecar tables fall back
    to mergeSchema inference."""
    schema_json = read_text_marker(spark, f"{path}/_schema")
    if schema_json is not None:
        df = spark.read.schema(StructType.fromJson(json.loads(schema_json))).parquet(path)
    else:
        df = spark.read.option("mergeSchema", "true").parquet(path)
    if "operation" in df.columns:
        # out-of-order tables store delete tombstones; they are merge
        # bookkeeping, not user rows (no-op on ordered tables)
        df = df.filter(F.col("operation") != "delete")
    return df.drop(*[c for c in META_COLS if c in df.columns])


def make_cdc_rollup_merger(
    path: str,
    agg_path: str,
    table: str,
    pk_cols: list[str],
    group_cols: list[str],
    value_expr,
    num_buckets: int = 64,
):
    """Incrementally maintained EXACT aggregate over a CDC stream — the op
    an append-only rollup (streaming/rollup.py) cannot be: updates and
    deletes must retract their old contribution, and CDC envelopes carry no
    before-image to retract with.

    The trick is the same bucket decomposition the row merge uses: keep a
    PARTIAL aggregate per (key-hash bucket, group) in ``agg_path``. After
    each merge, the dirty buckets' partials are recomputed wholesale from
    their freshly merged rows (so retraction is implicit — the old row
    simply isn't there anymore) and dynamic-overwritten; untouched buckets'
    partials remain exactly valid. ``read_rollup`` folds the partial table
    (num_buckets x |groups| rows, tiny) into the final aggregate. Cost per
    trigger stays O(batch + dirty-bucket rows); correctness is exact for
    any associative aggregate (count/sum here — pass a DECIMAL
    ``value_expr`` for engine-exact money sums)."""

    def on_merged(merged: DataFrame, dirty_ids: set, surviving: set) -> None:
        spark = merged.sparkSession
        partials = merged.groupBy("__bucket", *group_cols).agg(
            F.count(F.lit(1)).alias("n"), F.sum(value_expr).alias("total")
        )
        partials.write.mode("overwrite").partitionBy("__bucket").parquet(agg_path)
        # buckets emptied by deletes leave no partial rows either — drop
        # their stale agg partitions just like the row table's; the schema
        # sidecar keeps a fully-emptied agg table readable as zero rows
        write_text_marker(spark, f"{agg_path}/_schema", partials.schema.json())
        for bucket in sorted(dirty_ids - surviving):
            fs, part, _ = _fs_path(spark, f"{agg_path}/__bucket={bucket}")
            if fs.exists(part):
                fs.delete(part, True)

    return make_cdc_merger(path, table, pk_cols, num_buckets, on_merged=on_merged)


def read_rollup(spark, agg_path: str, group_cols: list[str]) -> DataFrame:
    """The user-facing aggregate view: fold the per-bucket partials. The
    scan is the partial table (bounded by num_buckets x |groups|), never
    the row table. Falls back to the ``_schema`` sidecar when deletes have
    emptied every partial partition (same contract as ``read_table``)."""
    # sidecar-first for the same reason as read_table: no inference job
    schema_json = read_text_marker(spark, f"{agg_path}/_schema")
    if schema_json is not None:
        partials = spark.read.schema(
            StructType.fromJson(json.loads(schema_json))
        ).parquet(agg_path)
    else:
        partials = spark.read.parquet(agg_path)
    return (
        partials.groupBy(*group_cols)
        .agg(F.sum("n").cast("bigint").alias("n"), F.sum("total").alias("total"))
    )



def expire_tombstones(spark, path: str, older_than: str) -> int:
    """Bound out-of-order tombstone retention: rewrite ONLY the buckets
    holding delete tombstones whose event time is before ``older_than``
    (an ISO timestamp string — the caller's lateness horizon, the same
    contract as a streaming watermark: changes later than this are
    declared impossible, so their tombstones can never matter again).
    Buckets with no expired tombstone keep their files untouched; a bucket
    left empty is removed like the merger's emptied-bucket sweep. Returns
    the number of tombstones dropped.

    Scale: the census scan projects (``__bucket``, operation, timestamp)
    only, and the rewrite is dirty-buckets only — the vacuum never touches
    the clean majority of a large table."""
    cutoff = F.to_timestamp(F.lit(older_than))
    stored = spark.read.option("mergeSchema", "true").parquet(path)
    if "operation" not in stored.columns:
        return 0
    expired = (F.col("operation") == "delete") & (F.col("timestamp") < cutoff)
    census = (
        stored.filter(expired)
        .groupBy("__bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )  # metadata-sized: ≤ num_buckets rows
    if not census:
        return 0
    dirty = [int(r["__bucket"]) for r in census]
    dropped = sum(int(r["n"]) for r in census)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    kept = (
        stored.filter(F.col("__bucket").isin(dirty))
        .filter(~expired)
        .localCheckpoint(eager=True)
    )
    kept.write.mode("overwrite").partitionBy("__bucket").parquet(path)
    surviving = {r[0] for r in kept.select("__bucket").distinct().collect()}
    for bucket in sorted(set(dirty) - surviving):
        fs, part, _ = _fs_path(spark, f"{path}/__bucket={bucket}")
        if fs.exists(part):
            fs.delete(part, True)
    return dropped


def make_fingerprinted_merger(
    path: str,
    fp_path: str,
    table: str,
    pk_cols: list[str],
    repr_cols,
    num_buckets: int = 64,
    out_of_order: bool = False,
):
    """CDC merger that keeps the table SELF-CERTIFYING: alongside each
    merge it maintains a per-bucket Merkle fingerprint (operators/diff.py
    row hash — order-independent exact SUM of 48-bit md5 row hashes) of
    the materialized rows, recomputed for DIRTY buckets only and
    dynamic-overwritten like the rollup merger's partials.

    ``repr_cols`` is the ordered list of columns/Column expressions that
    define a row's canonical form (pre-cast engine-dependent string forms
    — float/timestamp — per ``row_hash_expr``'s contract). ``read_
    fingerprint`` folds the per-bucket summaries to one (n_rows, checksum)
    row that any other engine can recompute from its replica of the table
    — continuous replica reconciliation at O(dirty buckets) per epoch,
    with no full-table scan ever."""
    from split_kinesis_streams_with_glue_spark.operators.diff import row_hash_expr

    def on_merged(merged: DataFrame, dirty_ids: set, surviving: set) -> None:
        spark = merged.sparkSession
        live = merged.filter(F.col("operation") != "delete")  # skip tombstones
        fp = (
            live.select("__bucket", row_hash_expr(repr_cols).alias("__h"))
            .groupBy("__bucket")
            .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("__h").alias("checksum"))
        )
        fp.write.mode("overwrite").partitionBy("__bucket").parquet(fp_path)
        write_text_marker(spark, f"{fp_path}/_schema", fp.schema.json())
        # Sweep fingerprint partitions for dirty buckets absent from the
        # FINGERPRINT output, not from the row table: out-of-order mode
        # keeps tombstones, so a bucket whose live rows were all deleted is
        # still in `surviving` (its tombstones survive) yet emits no fp
        # rows — sweeping dirty_ids - surviving would leave its stale
        # fingerprint behind and the certificate would over-count. In
        # ORDERED mode merged carries no tombstones (keep_deletes=False), so
        # live == merged and the fp census is exactly `surviving` — reuse it
        # instead of re-running the fingerprint aggregate for a ≤ num_buckets
        # row collect (one job per epoch saved; r13 optimization).
        present = (
            surviving
            if not out_of_order
            else {r[0] for r in fp.select("__bucket").distinct().collect()}
        )
        for bucket in sorted(dirty_ids - present):
            fs, part, _ = _fs_path(spark, f"{fp_path}/__bucket={bucket}")
            if fs.exists(part):
                fs.delete(part, True)

    return make_cdc_merger(
        path, table, pk_cols, num_buckets, on_merged=on_merged, out_of_order=out_of_order
    )


def read_fingerprint(spark, fp_path: str) -> DataFrame:
    """Fold the per-bucket fingerprint partials to the table-level
    (n_rows, checksum) pair — the kilobyte certificate a replica compares
    against its own recomputation. Scans only the summary table
    (≤ num_buckets rows). Sidecar-first like ``read_table`` — no
    inference job."""
    schema_json = read_text_marker(spark, f"{fp_path}/_schema")
    if schema_json is not None:
        partials = spark.read.schema(
            StructType.fromJson(json.loads(schema_json))
        ).parquet(fp_path)
    else:
        partials = spark.read.parquet(fp_path)
    return partials.agg(
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.sum("checksum").cast("decimal(38,0)").alias("checksum"),
    )


def make_scd2_merger(
    log_path: str,
    scd2_path: str,
    table: str,
    pk_cols: list[str],
    num_buckets: int = 64,
):
    """Incrementally maintained SCD2 history — ``scd2_history``
    (operators/compact.py) without ever re-windowing the full change log.

    Two bucketed stores: the raw VERSION LOG (every change row, kept — a
    key's delete must stay on record to close validity for versions that
    arrive later) and the derived SCD2 table (valid_from / valid_to /
    is_current rows). Per epoch, dirty buckets' log partitions merge in
    the delta (exact-duplicate rows dropped, so replays and at-least-once
    delivery stay idempotent) and the SCD2 windows recompute from those
    buckets' logs alone — validity is a per-key computation and a key
    lives in exactly one bucket, so clean buckets' derived rows stay
    exactly valid. O(batch + dirty-bucket log rows) per trigger."""
    marker = f"{log_path}/_last_epoch"

    def merge(env_batch: DataFrame, epoch_id: int) -> None:
        spark = env_batch.sparkSession
        last = read_marker(spark, marker)
        if last is not None and epoch_id <= last:
            return
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        delta = event_time(
            split_one(env_batch, table, keep_operation=True, prune=False)
        ).withColumn(
            "__bucket",
            F.pmod(F.xxhash64(*[F.col(c) for c in pk_cols]), F.lit(num_buckets)),
        )
        # pin once: the dirty census AND the pool both consume delta — on
        # the streaming path an unpinned batch source is read twice
        delta = delta.localCheckpoint(eager=True)
        stored = None
        try:
            # sidecar-first, same contract as make_cdc_merger: the log's
            # schema never shrinks, so no per-epoch mergeSchema footer sweep
            schema_json = read_text_marker(spark, f"{log_path}/_schema")
            if schema_json is not None:
                stored = spark.read.schema(
                    StructType.fromJson(json.loads(schema_json))
                ).parquet(log_path)
            else:
                stored = spark.read.option("mergeSchema", "true").parquet(log_path)
        except AnalysisException as exc:
            cond = (
                exc.getCondition()
                if hasattr(exc, "getCondition")
                else exc.getErrorClass()
            )
            if cond not in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"):
                raise
        dirty = [
            int(r[0]) for r in delta.select("__bucket").distinct().collect()
        ]  # metadata-sized
        if stored is None:
            pool = delta
        else:
            pool = stored.filter(F.col("__bucket").isin(dirty)).unionByName(
                delta, allowMissingColumns=True
            )
        # exact-duplicate drop = replay idempotence for the append-ish log.
        # The log write IS the pool's materialization (write-first, as in
        # make_cdc_merger): the SCD2 recompute reads the written dirty
        # buckets back instead of a localCheckpoint of the whole pool.
        pool = pool.distinct()
        pool_schema = pool.schema
        pool.write.mode("overwrite").partitionBy("__bucket").parquet(log_path)
        write_text_marker(spark, f"{log_path}/_schema", pool_schema.json())
        log_back = (
            spark.read.schema(pool_schema)
            .parquet(log_path)
            .filter(F.col("__bucket").isin(dirty))
        )
        hist = scd2_history(log_back, pk_cols)
        # the emptied-bucket census rides the write (observed metric)
        obs = Observation(f"scd2-present-{table}-{epoch_id}")
        observed = hist.observe(obs, F.collect_set("__bucket").alias("buckets"))
        hist_schema = hist.schema
        observed.write.mode("overwrite").partitionBy("__bucket").parquet(scd2_path)
        write_text_marker(spark, f"{scd2_path}/_schema", hist_schema.json())
        # a bucket whose keys were ALL deleted still has log rows (the
        # deletes), but may emit no scd2 rows — sweep its stale partition
        present = {int(b) for b in obs.get["buckets"]}
        for bucket in sorted(set(dirty) - present):
            fs, part, _ = _fs_path(spark, f"{scd2_path}/__bucket={bucket}")
            if fs.exists(part):
                fs.delete(part, True)
        write_marker(spark, marker, epoch_id)

    return merge


def read_scd2(spark, scd2_path: str) -> DataFrame:
    """The user-facing SCD2 table (bucket column dropped). Sidecar-first
    like ``read_table`` — no inference job."""
    schema_json = read_text_marker(spark, f"{scd2_path}/_schema")
    if schema_json is not None:
        df = spark.read.schema(StructType.fromJson(json.loads(schema_json))).parquet(
            scd2_path
        )
    else:
        df = spark.read.option("mergeSchema", "true").parquet(scd2_path)
    return df.drop("__bucket")


def scd2_stream(
    stream: DataFrame,
    log_path: str,
    scd2_path: str,
    checkpoint: str,
    table: str,
    pk_cols: list[str],
    num_buckets: int = 64,
):
    """Run the incremental SCD2 merger as a Structured Streaming sink
    (availableNow drain; same foreachBatch replay contract as
    cdc_merge_stream). Returns the started StreamingQuery."""
    merge = make_scd2_merger(log_path, scd2_path, table, pk_cols, num_buckets)
    return (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
