"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship end-to-end slice (SURVEY.md M1): synthesize
a mixed CDC envelope stream from sf0.001, wire round-trip, split, compact, and
aggregate — the reference pipeline (README.md:228-309) plus its Athena query
stage (image/image7.png), Spark-first.

``queries()`` / ``oracle_sql()`` expose the engine's operator inventory
(SURVEY.md §2) from the central registry in
``split_kinesis_streams_with_glue_spark.plans``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _registry():
    # import side-effect: populates the registry
    from split_kinesis_streams_with_glue_spark.plans import all_queries

    return all_queries()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC envelope stream → split → compact → SQL aggregate."""
    from split_kinesis_streams_with_glue_spark.envelope import generate_cdc_envelopes
    from split_kinesis_streams_with_glue_spark.operators.compact import compact, event_time
    from split_kinesis_streams_with_glue_spark.operators.split import split_one
    from split_kinesis_streams_with_glue_spark.sources.memory import json_roundtrip

    sf_dir = "/root/testdata/sf0.001"
    env = json_roundtrip(
        generate_cdc_envelopes(spark, sf_dir, "customer", "c_custkey", "c_acctbal")
    )
    # prune=False: single-table envelope — the all-null-column probe would
    # re-run the wire parse end to end to learn there is nothing to prune
    cust = compact(
        event_time(split_one(env, "customer", keep_operation=True, prune=False)),
        ["c_custkey"],
    )
    cust.createOrReplaceTempView("target_customer")
    return spark.sql(
        """
        SELECT c_mktsegment,
               COUNT(*) AS n_customers,
               ROUND(SUM(c_acctbal), 2) AS total_acctbal
        FROM target_customer
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in _registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query."""
    return {
        name: spec.oracle
        for name, spec in _registry().items()
        if spec.oracle is not None
    }
