"""Envelope JSON source — batch and streaming reads with schema inference
and corrupt-record (DLQ) routing.

Reproduces what the reference delegates to managed services:

- Glue crawler schema inference over the Firehose S3 prefix → here
  ``infer_envelope_schema`` (reference README.md:188-190, SURVEY.md S5).
  Spark's JSON inference natively widens int+double → double — the engine's
  default resolution of Glue's ``choice`` type (SURVEY.md §4.3).
- Firehose ErrorOutputPrefix → here ``columnNameOfCorruptRecord`` routing
  (reference README.md:77, SURVEY.md T3).

Scale posture: inference is a sampled pass (``sampling_ratio``) — at 100 TB
you infer on a fraction of input splits, then read with the *explicit* schema
(required by Structured Streaming anyway), so the hot path never pays
inference. JSON text scans are splittable (uncompressed/snappy), one task per
128 MB split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from split_kinesis_streams_with_glue_spark.envelope import METADATA_SCHEMA

CORRUPT_COL = "_corrupt_record"


def infer_envelope_schema(
    spark: SparkSession, path: str, sampling_ratio: float = 1.0
) -> T.StructType:
    """Infer the union envelope schema from JSON lines (crawler analog).

    The inferred ``data`` struct is the union of every table's columns —
    exactly what the reference's crawler produces (image/image2.png) — with
    numeric conflicts auto-widened (int+double → double). A corrupt-record
    column is appended so permissive reads can route bad lines to the DLQ.
    """
    inferred = (
        spark.read.option("samplingRatio", str(sampling_ratio))
        .option("mode", "DROPMALFORMED")
        .json(path)
        .schema
    )
    fields = [f for f in inferred.fields if f.name != CORRUPT_COL]
    # Guarantee metadata is the full six-field struct even if a sample missed
    # some fields, and keep the corrupt column last.
    out = []
    for f in fields:
        if f.name == "metadata":
            out.append(T.StructField("metadata", METADATA_SCHEMA, True))
        else:
            out.append(f)
    out.append(T.StructField(CORRUPT_COL, T.StringType(), True))
    return T.StructType(out)


def read_envelopes(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    sampling_ratio: float = 1.0,
) -> DataFrame:
    """Batch-read envelope JSON lines (PERMISSIVE: corrupt lines carried in
    ``_corrupt_record`` for DLQ routing, not dropped and not fatal)."""
    schema = schema or infer_envelope_schema(spark, path, sampling_ratio)
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_envelope_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """Streaming read over a directory of envelope JSON files.

    The file source consumes files as micro-batches — the engine's stand-in
    for the Kinesis connector (see ``sources.kinesis``), byte-compatible with
    the Firehose S3 layout (reference README.md:72-104). Schema must be
    explicit (Structured Streaming requirement) — produce it once with
    ``infer_envelope_schema`` over a sample prefix.
    """
    reader = (
        spark.readStream.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.json(path)


def valid_envelopes(env_df: DataFrame) -> DataFrame:
    """Well-formed envelope records (metadata parsed, not corrupt)."""
    cond = F.col("metadata").isNotNull()
    if CORRUPT_COL in env_df.columns:
        cond = cond & F.col(CORRUPT_COL).isNull()
    return env_df.filter(cond)


def corrupt_records(env_df: DataFrame) -> DataFrame:
    """Corrupt/unparseable lines → DLQ payload (Firehose ErrorOutputPrefix
    analog, reference README.md:77)."""
    if CORRUPT_COL not in env_df.columns:
        return env_df.limit(0).select(F.lit(None).cast("string").alias(CORRUPT_COL))
    # Spark disallows queries that reference *only* the corrupt-record column
    # of a raw JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and column
    # pruning would undo a transient projection — so the DLQ frame carries
    # ``metadata`` (null for corrupt lines) alongside the raw line.
    return env_df.select(CORRUPT_COL, "metadata").filter(
        F.col(CORRUPT_COL).isNotNull()
    )
