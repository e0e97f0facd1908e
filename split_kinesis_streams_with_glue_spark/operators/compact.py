"""CDC compaction (T7): materialize latest-row-per-primary-key from a
change stream.

The reference defers this to downstream consumers — its envelopes carry
``metadata.operation`` ∈ {load, insert, update, delete}
(reference README.md:205; image/image3.png) but the demo only splits and
flattens. A queryable table needs upsert semantics: keep the newest version
of each key, drop keys whose newest record is a delete.

Batch form is pure window SQL → oracle-checkable. Scale: one shuffle on the
primary key; skewed PKs don't exist by construction (PKs are unique per
version chain, chain length = #changes per key, bounded); AQE handles
stragglers. The same logic in streaming form is
``dropDuplicates`` within watermark (see streaming.split_stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compact(
    df: DataFrame,
    pk_cols: list[str],
    ts_col: str = "timestamp",
    op_col: str = "operation",
    drop_meta: bool = True,
    keep_deletes: bool = False,
) -> DataFrame:
    """Latest-per-PK with delete handling.

    ``row_number() over (partition by pk order by ts desc) = 1`` then drop
    rows whose winning operation is 'delete'. Ties on ``ts`` break on
    operation rank (delete > update > insert > load) so a delete at the same
    event time wins — the conservative CDC ordering.

    ``keep_deletes=True`` retains winning delete rows as TOMBSTONES instead
    of dropping them — required when changes can arrive out of order across
    batches (streaming/cdc_merge.py's out-of-order mode): the tombstone's
    event time must stay around to beat a late-arriving older update, else
    the deleted row resurrects. Readers filter ``op_col != 'delete'``.
    """
    op_rank = (
        F.when(F.col(op_col) == "delete", 3)
        .when(F.col(op_col) == "update", 2)
        .when(F.col(op_col) == "insert", 1)
        .otherwise(0)
    )
    w = Window.partitionBy(*pk_cols).orderBy(F.col(ts_col).desc(), op_rank.desc())
    out = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    if not keep_deletes:
        out = out.filter(F.col(op_col) != "delete")
    out = out.drop("__rn")
    if drop_meta:
        out = out.drop(ts_col, op_col)
    return out


def event_time(df: DataFrame, ts_col: str = "timestamp") -> DataFrame:
    """Parse the envelope's ISO-8601 microsecond timestamp string
    (reference README.md:213) into a real TimestampType column for
    event-time operations (windows, watermarks)."""
    return df.withColumn(
        ts_col, F.to_timestamp(F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
    )


def scd2_history(
    df: DataFrame,
    pk_cols: list[str],
    ts_col: str = "timestamp",
    op_col: str = "operation",
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a CDC change stream:
    every non-delete version becomes a row with ``valid_from`` /
    ``valid_to`` (next change's event time, NULL while current) and
    ``is_current``. A delete closes the last version's validity without
    emitting a row. Same single pk-shuffle + sort cost envelope as
    ``compact`` — history is the window BEFORE picking the winner."""
    w = Window.partitionBy(*pk_cols).orderBy(F.col(ts_col))
    return (
        df.withColumn("valid_to", F.lead(F.col(ts_col)).over(w))
        .filter(F.col(op_col) != "delete")
        .withColumn("is_current", F.col("valid_to").isNull())
        .withColumnRenamed(ts_col, "valid_from")
        .drop(op_col)
    )
