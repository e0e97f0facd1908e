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

from pyspark.sql import DataFrame
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
