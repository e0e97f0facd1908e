"""In-memory envelope JSON round-trip — exercise the real serialize/parse
path without file I/O (used by the driver-facing queries, which must be
self-contained given only (spark, sf_dir)).

``from_json`` is a Catalyst expression: the parse stays JVM-side inside
whole-stage codegen, identical economics to the file-based JSON scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from split_kinesis_streams_with_glue_spark.sources.json_envelope import CORRUPT_COL


def parse_envelope_lines(lines_df: DataFrame, schema: T.StructType) -> DataFrame:
    """Parse single-column ('value') JSON lines into envelopes with PERMISSIVE
    corrupt-record routing (same contract as ``read_envelopes``).

    The parse is wrapped in ``explode(array(...))`` — a Generate node — so
    the optimizer cannot inline the ``from_json`` into downstream filters
    and projections. Without the barrier, a filter on ``metadata.*`` pushed
    below the flattening Project re-embeds the whole parse expression into
    its condition AND the surviving Project, so every row pays the JSON
    codec 2-5x (the guide §4.4 duplication pattern, with a heavyweight JVM
    expression instead of a UDF — measured 2x wall on cdc_compact_customer).
    ``explode(array(x))`` is row-for-row identical: ``array(x)`` always has
    exactly one element, and a null parse yields one row with a null
    envelope, exactly as the bare projection did.

    Tradeoff (round-13 advice): the barrier also blocks ``from_json``
    schema pruning and filter pushdown below the parse for EVERY consumer —
    a narrow consumer that reads only a few struct fields pays the
    full-schema parse. Acceptable for the envelope workloads here (every
    consumer flattens most of the struct, and the duplication it prevents
    was measured at 2-5x per row); a future narrow consumer can bypass the
    barrier by projecting ``from_json`` directly.
    """
    if not any(f.name == CORRUPT_COL for f in schema.fields):
        schema = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
        )
    parsed = lines_df.select(
        F.explode(
            F.array(
                F.from_json(
                    F.col("value"),
                    schema,
                    {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
                )
            )
        ).alias("env")
    )
    return parsed.select("env.*")


def json_roundtrip(env_df: DataFrame) -> DataFrame:
    """Serialize envelopes to JSON lines and parse them back — the wire
    round-trip (Firehose write → Glue read) as one narrow, shuffle-free
    transformation chain."""
    from split_kinesis_streams_with_glue_spark.envelope import to_json_lines

    return parse_envelope_lines(to_json_lines(env_df), env_df.schema)
