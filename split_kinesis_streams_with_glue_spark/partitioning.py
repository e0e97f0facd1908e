"""Physical-layout helpers (SURVEY.md §2.3, §4.2).

The engine's operators are declarative; the one physical decision Catalyst
cannot make for us is *input parallelism when the scan is tiny*: a table that
arrives as fewer splits than the cluster has cores serializes every
CPU-heavy expression downstream (HOF lambdas, regex tokenization, hash
lanes). ``rebalance`` widens such scans; at real scale (input splits >=
cores) it is a no-op, so it never adds a shuffle to a 100 TB scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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


def global_rank(
    df: DataFrame,
    *order_cols,
    rank_col: str = "__rn",
    n_partitions: int = 32,
) -> DataFrame:
    """Dense global ``row_number`` over ``order_cols`` WITHOUT a
    single-partition window — the two-pass plan shape introduced by
    ``operators/dedup.py sorted_neighborhood_pairs`` (round 8), factored
    out once it grew a second consumer (``sampling.quantile_normalize``).

    Pass 1: ``repartitionByRange`` on the order columns + a per-PARTITION
    ``row_number`` (parallel windows). Pass 2: each partition's rank
    offset comes from a broadcast #partitions-row count frame. Because
    range partitioning respects the total order, offset + within-partition
    rank IS the global rank. The ranged frame is lazily localCheckpointed
    so the SAMPLED range boundaries are identical in both passes (the PCA
    operator's idiom, similarity.py) — without the pin, the counts pass
    and the rank pass could draw different boundary samples and disagree
    on partition membership.

    Caller contract (inherited from sorted_neighborhood_pairs): the
    order-column tuple must be a total order (append a unique id as the
    last column) and NULL-free — Spark sorts NULLS FIRST ascending while
    SQL engines default NULLS LAST.

    Returns the input columns plus ``rank_col`` (1-based global rank).
    """
    ranged = (
        df.repartitionByRange(n_partitions, *[F.col(c).asc() for c in order_cols])
        .withColumn("__gr_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    counts = ranged.groupBy("__gr_pid").agg(F.count(F.lit(1)).alias("__gr_c"))
    woff = Window.orderBy("__gr_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )  # bounded: one row per partition
    offsets = counts.select(
        "__gr_pid",
        F.coalesce(F.sum("__gr_c").over(woff), F.lit(0)).alias("__gr_off"),
    )
    wp = Window.partitionBy("__gr_pid").orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    return (
        ranged.join(F.broadcast(offsets), "__gr_pid")
        .withColumn(rank_col, F.row_number().over(wp) + F.col("__gr_off"))
        .drop("__gr_pid", "__gr_off")
    )
