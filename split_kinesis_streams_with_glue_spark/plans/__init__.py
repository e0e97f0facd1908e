"""Query library: the engine's driver-facing query registry (SURVEY.md §2
coverage) and the flagship end-to-end pipeline."""

from split_kinesis_streams_with_glue_spark.plans.all import all_queries

__all__ = ["all_queries"]
