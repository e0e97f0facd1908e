"""Physical-layout helpers (SURVEY.md §2.3, §4.2).

The engine's operators are declarative; the one physical decision Catalyst
cannot make for us is *input parallelism when the scan is tiny*: a table that
arrives as fewer splits than the cluster has cores serializes every
CPU-heavy expression downstream (HOF lambdas, regex tokenization, hash
lanes). ``rebalance`` widens such scans; at real scale (input splits >=
cores) it is a no-op, so it never adds a shuffle to a 100 TB scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def rebalance(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition iff the frame has fewer partitions than the
    session's core count (or ``min_partitions``).

    Use before CPU-bound per-row work (tokenization, shingling, hashing,
    pandas UDFs) on frames that may come from small files. The partition
    probe is plan-only — no job runs.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
