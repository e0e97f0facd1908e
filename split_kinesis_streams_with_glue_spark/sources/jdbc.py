"""JDBC backfill source (S3) — the engine analog of the DMS full-load phase
(reference README.md:157-166: ``--migration-type full-load-and-cdc``).

Full load = partitioned parallel JDBC read; the same transform code then
runs on the batch frame and the CDC stream (DataFrame code is batch/stream
symmetric, SURVEY.md T1). In tests the backfill is a batch read of fixture
Parquet — this module is the production binding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **properties: str,
) -> DataFrame:
    """Parallel JDBC snapshot read.

    With ``partition_column`` bounds, Spark issues ``num_partitions`` range
    queries concurrently — the engine's version of DMS's 8-subtask × 16-thread
    parallel load (reference README.md:119-137). Without, a single-connection
    read (small dims only).
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read requires lower/upper bounds")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in properties.items():
        reader = reader.option(k, v)
    return reader.load()
