"""Snapshot diff → CDC change feed: the inverse of compaction.

The engine's CDC surface consumes change streams (split → compact →
merge-apply). ``table_diff`` goes the other way: given two snapshots of a
keyed table, emit the minimal change feed (insert / update / delete per
key) that turns the old one into the new one — how you bootstrap CDC from
periodic full exports when no binlog tap exists (the DMS-less fallback for
the reference's full-load sources, README.md:157-166), and how you audit
that an applied feed matches the producer's snapshot.

Shape: ONE full-outer sort-merge join on the primary key, column
comparison via null-safe equality (``<=>``), no driver-side anything.
At scale both snapshots shuffle once on the pk; with both sides bucketed
on the pk (sources/catalog bucketed writes) even that shuffle disappears.
Unchanged keys are dropped before the output projection, so the result is
|changes|-sized, not |table|-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    pk_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Emit (operation, *columns) rows: 'insert' keys only in ``new``,
    'delete' keys only in ``old`` (with the old values), 'update' keys in
    both whose compared columns differ (with the new values). Keys with
    identical rows produce nothing."""
    compare_cols = compare_cols or [c for c in new.columns if c not in pk_cols]
    o = old.select(
        *[F.col(c).alias(f"__ok_{c}") for c in pk_cols],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(c).alias(f"__nk_{c}") for c in pk_cols],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
    )
    cond = None
    for c in pk_cols:
        this = F.col(f"__ok_{c}") == F.col(f"__nk_{c}")
        cond = this if cond is None else cond & this
    joined = o.join(n, cond, "full_outer")
    in_old = F.col(f"__ok_{pk_cols[0]}").isNotNull()
    in_new = F.col(f"__nk_{pk_cols[0]}").isNotNull()
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    op = (
        F.when(~in_old, F.lit("insert"))
        .when(~in_new, F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    out = joined.withColumn("operation", op).filter(F.col("operation").isNotNull())
    side = lambda c: F.when(  # noqa: E731
        F.col("operation") == "delete", F.col(f"__o_{c}")
    ).otherwise(F.col(f"__n_{c}"))
    return out.select(
        "operation",
        *[
            F.when(F.col("operation") == "insert", F.col(f"__nk_{c}"))
            .otherwise(F.col(f"__ok_{c}"))
            .alias(c)
            for c in pk_cols
        ],
        *[side(c).alias(c) for c in compare_cols],
    )


def row_hash_expr(cols: list) -> Column:
    """48-bit cross-engine row hash: first 12 md5 hex chars of the
    '\\x1f'-joined string forms (nulls → '\\x00' sentinel) as
    DECIMAL(38,0) — exact to SUM order-independently. Accepts column
    names or Column expressions (pre-cast engine-dependent string forms —
    float/timestamp — to decimal/ISO upstream). DuckDB twin:
    ``CAST(('0x'||substr(md5(a||chr(31)||b||...),1,12)) AS BIGINT)``."""
    reprs = [
        F.coalesce((F.col(c) if isinstance(c, str) else c).cast("string"), F.lit("\x00"))
        for c in cols
    ]
    return F.conv(
        F.substring(F.md5(F.concat_ws("\x1f", *reprs)), 1, 12), 16, 10
    ).cast("decimal(38,0)")


def _bucket_expr(pk_cols: list[str], num_buckets: int):
    """Cross-engine-reproducible bucket id: first 4 md5 hex chars of the
    joined pk string, mod ``num_buckets``. (DuckDB:
    ``CAST(('0x'||substr(md5(pk),1,4)) AS BIGINT) % n``.)"""
    pk = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in pk_cols])
    return (F.conv(F.substring(F.md5(pk), 1, 4), 16, 10).cast("long") % num_buckets).alias(
        "bucket"
    )


def table_fingerprint(
    df: DataFrame,
    pk_cols: list[str],
    compare_cols: list[str] | None = None,
    num_buckets: int = 256,
) -> DataFrame:
    """Merkle-style per-bucket checksum summary: (bucket, n_rows, checksum).

    Row hash = first 48 bits of md5 over the '\\x1f'-joined string forms of
    pk + compared columns (nulls → '\\x00' sentinel); bucket checksum =
    exact SUM of row hashes (order-independent, mergeable — a bucket's
    checksum is the same whether computed in one pass or unioned from
    partial fingerprints). Two snapshots agree on a bucket's (n_rows,
    checksum) iff (within 2^-48 collision odds per changed row) the bucket
    holds identical rows — so comparing two O(num_buckets)-sized summaries
    localizes every change without joining the tables row-by-row.

    Callers must pre-cast columns whose string form is engine-dependent
    (float/timestamp) to decimal/ISO strings if the fingerprint is compared
    cross-engine; integer and string columns are safe as-is.

    Scale shape: one scan + one map-side-combining aggregation per
    snapshot; the summary is num_buckets rows regardless of table size.
    The anti-entropy primitive for 100 TB replica reconciliation: ship the
    kilobyte summary, not the table.
    """
    compare_cols = compare_cols or [c for c in df.columns if c not in pk_cols]
    row_hash = row_hash_expr([*pk_cols, *compare_cols])
    return (
        df.select(_bucket_expr(pk_cols, num_buckets), row_hash.alias("__h"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("__h").alias("checksum"),
        )
    )


def merkle_diff(
    old: DataFrame,
    new: DataFrame,
    pk_cols: list[str],
    compare_cols: list[str] | None = None,
    num_buckets: int = 256,
) -> DataFrame:
    """``table_diff`` that pays only for what changed: compare the two
    per-bucket fingerprints first, then run the row-level full-outer diff
    on rows from DIRTY buckets only. Result is row-identical to
    ``table_diff(old, new, ...)`` (the md5 bucket assignment is a pure
    function of the pk, so an old/new row pair always lands in the same
    bucket and a clean bucket can hide no change).

    Scale shape: two summary scans (no pk shuffle), a num_buckets-row
    comparison, then a pk join over the dirty fraction only — at 1% churn
    the expensive join touches ~1% of each table instead of all of it.
    The dirty-bucket set is broadcast as a semi-join filter, never
    collected."""
    compare_cols = compare_cols or [c for c in new.columns if c not in pk_cols]
    fo = table_fingerprint(old, pk_cols, compare_cols, num_buckets)
    fn_ = table_fingerprint(new, pk_cols, compare_cols, num_buckets)
    o = fo.select("bucket", F.col("n_rows").alias("__no"), F.col("checksum").alias("__co"))
    n = fn_.select("bucket", F.col("n_rows").alias("__nn"), F.col("checksum").alias("__cn"))
    dirty = (
        o.join(n, "bucket", "full_outer")
        .filter(
            ~F.col("__no").eqNullSafe(F.col("__nn"))
            | ~F.col("__co").eqNullSafe(F.col("__cn"))
        )
        .select("bucket")
    )
    bexpr = _bucket_expr(pk_cols, num_buckets)
    old_dirty = old.withColumn("bucket", bexpr).join(
        F.broadcast(dirty), "bucket", "left_semi"
    ).drop("bucket")
    new_dirty = new.withColumn("bucket", bexpr).join(
        F.broadcast(dirty), "bucket", "left_semi"
    ).drop("bucket")
    return table_diff(old_dirty, new_dirty, pk_cols, compare_cols)
