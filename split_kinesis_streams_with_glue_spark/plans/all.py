"""Registry assembly — importing this module registers every query family."""

from __future__ import annotations

# imports are side-effecting: each module fills REGISTRY on import
import split_kinesis_streams_with_glue_spark.plans.pipeline_queries  # noqa: F401
import split_kinesis_streams_with_glue_spark.plans.sql_queries  # noqa: F401
import split_kinesis_streams_with_glue_spark.plans.extension_queries  # noqa: F401
import split_kinesis_streams_with_glue_spark.plans.event_queries  # noqa: F401

from split_kinesis_streams_with_glue_spark.plans.registry import REGISTRY, QuerySpec


def all_queries() -> dict[str, QuerySpec]:
    return dict(REGISTRY)
