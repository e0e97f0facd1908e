"""split_kinesis_streams_with_glue_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference pipeline (``Nickbehindgfw/split_kinesis_streams_with_glue``): a CDC
envelope stream splitter/flattener (reference README.md:228-309) plus the full
ad-hoc ANSI-SQL surface the reference delegates to Athena (README.md:312-314),
re-expressed Spark-first:

- DataFrame / Spark SQL everywhere; Catalyst handles pushdown and pruning.
- Structured Streaming for the streaming split (foreachBatch fan-out).
- Pandas UDFs only where built-ins genuinely can't express the semantics
  (multimodal decode); everything else stays in whole-stage codegen.

Designed for a 1000-executor cluster at ~100 TB; tested at local[32] on the
driver fixtures.
"""

from split_kinesis_streams_with_glue_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
