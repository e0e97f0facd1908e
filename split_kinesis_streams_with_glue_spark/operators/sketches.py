"""Mergeable distinct-count sketches (HyperLogLog) for rollup tables.

``approx_count_distinct`` answers ONE query; a stored sketch answers every
range query after the fact. The pattern: aggregate each time bucket (or any
rollup cell) into a serialized HLL sketch once, then answer "distinct users
over ANY day range / cell union" by merging just those buckets' sketches —
no rescan of the raw events. Merging is associative and commutative, so
Spark executes it as a partial + final aggregate, and the sketch table is
tiny (one row per bucket, ~1-2 KB per sketch) regardless of event volume.

At 100 TB this is the difference between answering a 90-day distinct-users
question from 90 kilobyte-sized rows and re-scanning a quarter of the fact
table. Exactness is bounded: Spark's HLL++ at default lgConfigK=12 has a
standard error of ~1.6%; the registry contract query pins observed error
<= 5% against the exact count.

All built-in expressions (``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``) — JVM-side, codegen-compatible, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucket_sketches(
    df: DataFrame,
    bucket: Column,
    key: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """One HLL sketch of ``key`` per (bucket, *group_cols) cell — the
    materializable rollup table. Columns: bucket, *group_cols, sketch,
    n_rows (exact row count rides along for free)."""
    group_cols = group_cols or []
    return df.groupBy(bucket.alias("bucket"), *group_cols).agg(
        F.hll_sketch_agg(key).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def range_distinct(
    sketches: DataFrame,
    bucket_filter: Column,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Approximate distinct count over any union of buckets, answered from
    the sketch table alone: filter buckets, merge sketches, estimate."""
    group_cols = group_cols or []
    merged = sketches.filter(bucket_filter).groupBy(*group_cols).agg(
        F.hll_union_agg("sketch").alias("merged"),
        F.sum("n_rows").alias("n_rows"),
    )
    return merged.select(
        *group_cols,
        F.hll_sketch_estimate("merged").alias("approx_distinct"),
        "n_rows",
    )
