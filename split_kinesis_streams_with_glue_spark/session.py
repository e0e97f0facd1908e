"""SparkSession factory with scale-oriented defaults.

Local test profile mirrors what we'd set fleet-wide on a real cluster:

- AQE on (runtime coalesce of shuffle partitions, skew-join splitting) —
  at 100 TB the static ``spark.sql.shuffle.partitions`` is always wrong for
  some stage; AQE re-plans from actual map output sizes.
- Arrow on for the (rare) pandas-UDF paths.
- UTC session timezone so timestamp semantics match the DuckDB oracle.

On a real cluster you would additionally size ``spark.sql.shuffle.partitions``
to ~2-3x total cores and rely on AQE coalescing, and set
``spark.sql.files.maxPartitionBytes`` (default 128 MB) so a 100 TB scan yields
~800k input splits — fine for a 1000-executor fleet.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "split_kinesis_streams_with_glue_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) for
    tests; on a cluster you pass the real master URL / rely on spark-submit.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Runtime row-level pruning for shuffle joins: build a bloom filter
        # on the small side's join keys and push it into the big side's
        # scan. At 100 TB this is the difference between shuffling a full
        # fact table and shuffling only rows that can actually join.
        # (runtimeFilter.semiJoinReduction looks tempting too, but enabling
        # it hangs the very first job on this Spark build — optimizer loop)
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # The driver fixtures' events.parquet stores TIMESTAMP(NANOS), which
        # Spark's vectorized reader rejects; read as long and convert
        # (truncate to micros — matching what DuckDB's reader does).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Whole-stage codegen gives up on operators wider than maxFields
        # (default 100). The MinHash signature HashAggregate is 129 fields
        # (id + 128 min lanes), so BOTH its partial and final aggregates ran
        # INTERPRETED — measured ~4.0 s vs ~0.7 s stage floor at sf0.1, and
        # a consistent 15-25% on the full dedup_minhash_lsh query once
        # codegen fires (executed-plan proof: the aggregates gain *(n)
        # markers at 160). Width is a property of the PLAN, not the cluster,
        # so this holds at any scale/core count. 160 (not unbounded) keeps
        # genuinely enormous plans on the interpreted path where codegen
        # class size would hurt compile time. (tests/test_plans.py pins the
        # codegen marker on the signature aggregate.)
        .config("spark.sql.codegen.maxFields", "160")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
