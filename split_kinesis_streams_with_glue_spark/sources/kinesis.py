"""Kinesis streaming source interface (S1) — production connector binding.

The reference ingests from a Kinesis Data Stream (reference README.md:63-67).
Spark reads Kinesis through an external connector package
(e.g. ``spark-sql-kinesis`` / the Kinesis EFO connector), which is not
installable in this environment — so the binding is interface-complete but
gated: if the connector isn't on the classpath, a clear error points at the
file-source stand-in used everywhere in tests
(``sources.json_envelope.read_envelope_stream``), which consumes the same
envelope schema from the Firehose S3 layout (reference README.md:72-104).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_kinesis_stream(
    spark: SparkSession,
    stream_name: str,
    region: str,
    endpoint_url: str | None = None,
    starting_position: str = "TRIM_HORIZON",
    fmt: str = "kinesis",
) -> DataFrame:
    """readStream from Kinesis; raw records arrive in the connector's
    ``data`` binary column and are parsed with the same envelope machinery
    (``parse_envelope_lines``) as the file path."""
    try:
        reader = (
            spark.readStream.format(fmt)
            .option("streamName", stream_name)
            .option("region", region)
            .option("startingPosition", starting_position)
        )
        if endpoint_url:
            reader = reader.option("endpointUrl", endpoint_url)
        return reader.load()
    except Exception as exc:
        raise RuntimeError(
            "Kinesis connector not available on this classpath. Locally, use "
            "sources.json_envelope.read_envelope_stream over the Firehose-"
            "layout JSON files — identical envelope schema and downstream "
            "code path."
        ) from exc
