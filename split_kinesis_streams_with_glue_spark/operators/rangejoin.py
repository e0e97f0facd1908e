"""Keyless interval-point range join, bucketed to stay off the nested loop.

``points.ts BETWEEN intervals.start AND intervals.end`` with NO shared equi
key is the one join shape Spark's planner can only execute as a (broadcast)
nested loop — O(|points| x |intervals|) comparisons, a wall at scale. The
standard fix (DuckDB's IEJoin and Flink's interval join do versions of it):
discretize time into fixed-width buckets, replicate each interval onto
every bucket it overlaps, tag each point with its single bucket, equi-join
on the bucket, and re-check the exact predicate post-join.

Cost model: replication factor per interval is ``ceil(len/width) + 1``, a
point lands in exactly one bucket, and every true match meets in exactly
one bucket pair — so the join is a plain shuffle-hash/sort-merge on the
bucket key with output ~= matches + false bucket collisions. Pick
``bucket_width`` near the typical interval length: wider buckets mean
fewer replicas but more false candidates to post-filter, narrower the
reverse. Skewed buckets (everything in one hour) are ordinary equi-join
skew — AQE's skew-join splitting applies, which is exactly what the
nested loop denies you.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_width_seconds: int = 1800,
) -> DataFrame:
    """INNER-join each point to every interval containing it
    (``start <= ts < end``), as a bucketed equi-join. Column names must be
    disjoint between the two inputs (alias upstream if needed). Only the
    inner form exists: an outer variant would need its null-extension
    AFTER the containment post-filter, which a joined-then-filtered plan
    cannot express — left-outer semantics = inner result left-joined back
    onto the points by the caller."""
    w = bucket_width_seconds

    def bucket_of(c: Column) -> Column:
        return F.floor(F.unix_timestamp(c) / w).cast("long")

    ib = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(bucket_of(F.col(start_col)), bucket_of(F.col(end_col)))
        ),
    )
    pb = points.withColumn("__b", bucket_of(F.col(point_ts)))
    return (
        pb.join(ib, "__b")
        .filter(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) < F.col(end_col))
        )
        .drop("__b")
    )
