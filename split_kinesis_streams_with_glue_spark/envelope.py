"""CDC envelope data model (SURVEY.md M0).

The engine's primary input is the DMS-style change-record envelope the
reference pipeline carries through Kinesis/Firehose (reference
README.md:200-221)::

    {"data": {...row...}, "metadata": {"timestamp": "...", "record-type": ...,
     "operation": ..., "partition-key-type": ..., "schema-name": ...,
     "table-name": ...}}

``data`` is null for DDL/control records (reference README.md:257-263).
Metadata field names contain hyphens, so they are always addressed as
``F.col("metadata.`table-name`")`` in engine code.

This module builds envelope DataFrames *from* the driver's parquet tables so
every split output is checkable against its source (round-trip property,
SURVEY.md §5.2), and serializes them to JSON lines — the same wire shape the
reference's Firehose lands on S3.

Scale note: ``wrap`` / ``to_json_lines`` are pure narrow projections — no
shuffle, fully codegen'd (struct construction + to_json are Catalyst
expressions), so envelope synthesis parallelizes linearly with input splits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA_NAME = "dms_sample"

#: metadata struct — exactly the six string fields of the reference envelope
#: (reference README.md:200-221; crawler view image/image1.png).
METADATA_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.StringType(), False),
        T.StructField("record-type", T.StringType(), False),
        T.StructField("operation", T.StringType(), False),
        T.StructField("partition-key-type", T.StringType(), False),
        T.StructField("schema-name", T.StringType(), False),
        T.StructField("table-name", T.StringType(), False),
    ]
)

#: ISO-8601 with microseconds + Z, as in the reference sample record
#: (reference README.md:213: "2019-11-13T09:59:08.059607Z").
ISO_MICROS = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"

BASE_TS = "2019-11-13 09:59:08"


def meta_col(field: str) -> Column:
    """Backtick-safe accessor for hyphenated metadata fields."""
    return F.col(f"metadata.`{field}`")


def _metadata_struct(
    table_name: str | Column,
    operation: str | Column,
    ts: Column,
    record_type: str | Column = "data",
    schema_name: str = SCHEMA_NAME,
) -> Column:
    lit = lambda v: F.lit(v) if isinstance(v, str) else v  # noqa: E731
    return F.struct(
        F.date_format(ts, ISO_MICROS).alias("timestamp"),
        lit(record_type).alias("record-type"),
        lit(operation).alias("operation"),
        F.lit("primary-key").alias("partition-key-type"),
        F.lit(schema_name).alias("schema-name"),
        lit(table_name).alias("table-name"),
    )


def wrap(
    df: DataFrame,
    table_name: str,
    operation: str | Column = "load",
    schema_name: str = SCHEMA_NAME,
    seq: Column | None = None,
) -> DataFrame:
    """Wrap table rows into CDC envelopes (one envelope per row).

    ``seq`` (optional integer Column) offsets the metadata timestamp by that
    many seconds, giving CDC phases a total event-time order for compaction
    tests. Narrow, shuffle-free.
    """
    ts = F.to_timestamp(F.lit(BASE_TS))
    if seq is not None:
        ts = F.timestamp_add("SECOND", seq.cast("long"), ts)
    data = F.struct(*[F.col(c) for c in df.columns])
    return df.select(
        data.alias("data"),
        _metadata_struct(table_name, operation, ts, schema_name=schema_name).alias("metadata"),
    )


def control_records(
    spark: SparkSession, table_names: list[str], n_per_table: int = 1
) -> DataFrame:
    """DDL/control records: ``data`` null, ``record-type`` = 'control'
    (reference README.md:257-263 — create/drop-table records with empty data).

    Returned with only the ``metadata`` column; union with ``unionByName``
    (allowMissingColumns) or after adding a typed null ``data``.
    """
    rows = [(t, i) for t in table_names for i in range(n_per_table)]
    df = spark.createDataFrame(rows, "table_name string, i int")
    ts = F.to_timestamp(F.lit(BASE_TS))
    return df.select(
        _metadata_struct(
            F.col("table_name"), F.lit("create-table"), ts, record_type="control"
        ).alias("metadata")
    )


def to_json_lines(env_df: DataFrame) -> DataFrame:
    """Serialize envelopes to single-column ('value') JSON lines — the wire
    format Firehose writes (reference README.md:78-82), minus GZIP: the engine
    deliberately stores test streams uncompressed / parquet because 128 MB
    GZIP objects are non-splittable and serialize the scan (SURVEY.md §4.2).
    """
    return env_df.select(F.to_json(F.struct(*env_df.columns)).alias("value"))


def generate_cdc_envelopes(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    pk: str,
    update_col: str | None = None,
) -> DataFrame:
    """Deterministic full-load + CDC envelope stream for one driver table
    (FIXTURES.md F3; mirrors DMS full-load-and-cdc, reference README.md:157-166).

    Phases (all keyed off ``pk % k`` so a SQL oracle can reproduce the exact
    final state):

    - load:    every row, seq 0
    - update1: rows with pk % 5 == 0 → ``update_col`` = original + 100, seq 1
    - update2: rows with pk % 10 == 0 → ``update_col`` = original + 200, seq 2
    - delete:  rows with pk % 7 == 0, seq 3 (delete wins over updates)

    Final state = rows with pk % 7 != 0, update_col adjusted (+200 if %10,
    else +100 if %5, else original).

    Plan shape (r13 optimization): ONE source scan. Each row emits its
    phase list — always load; update/delete phases keyed off ``pk % k`` —
    as an array of (operation, seq) structs, exploded into envelope rows.
    The previous formulation unioned four filtered ``wrap`` branches, i.e.
    four full scans of the source per envelope consumer; row-for-row the
    output is identical (same phases, same adjusted values, same metadata
    timestamps), only the pass count changes.  Physical ORDER differs:
    rows interleave per source row (load, update, delete for row 1, then
    row 2 …) instead of phase-grouped (all loads, then all updates …) —
    the row SET is identical, so only order-sensitive consumers of raw
    fixture layouts (none registered) would notice (round-13 advice).
    """
    src = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    key = F.col(pk)
    ph = lambda op, seq: F.struct(  # noqa: E731
        F.lit(op).alias("op"), F.lit(seq).alias("seq")
    )
    phases = [ph("load", 0)]
    if update_col is not None:
        phases.append(F.when(key % 5 == 0, ph("update", 1)))
        phases.append(F.when(key % 10 == 0, ph("update", 2)))
    phases.append(F.when(key % 7 == 0, ph("delete", 3)))
    exploded = src.select(
        "*",
        F.explode(
            F.filter(F.array(*phases), lambda x: x.isNotNull())
        ).alias("__ph"),
    )
    seq = F.col("__ph.seq")
    if update_col is not None:
        # update1 adds 100, update2 adds 200; load/delete carry the original
        adjusted = (
            F.when(seq == 1, F.col(update_col) + 100)
            .when(seq == 2, F.col(update_col) + 200)
            .otherwise(F.col(update_col))
        )
    data = F.struct(
        *[
            (adjusted if (update_col is not None and c == update_col) else F.col(c)).alias(c)
            for c in src.columns
        ]
    )
    ts = F.timestamp_add("SECOND", seq.cast("long"), F.to_timestamp(F.lit(BASE_TS)))
    return exploded.select(
        data.alias("data"),
        _metadata_struct(table, F.col("__ph.op"), ts).alias("metadata"),
    )


def write_envelope_fixture(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    tables: dict[str, dict] | None = None,
    with_control: bool = True,
    corrupt_lines: int = 2,
    n_files: int = 4,
) -> str:
    """Materialize a mixed multi-table envelope stream as JSON-lines files.

    ``tables`` maps table name → {"pk": ..., "update_col": ...} (defaults
    cover the FIXTURES.md F2 set). The mixed stream interleaves all tables in
    one dataset — the single-Kinesis-stream shape the splitter exists to undo
    (reference README.md:63-67, 323). ``n_files`` output files double as
    micro-batches for the streaming file source (FIXTURES.md F4).
    """
    tables = tables if tables is not None else DEFAULT_FIXTURE_TABLES
    frames = []
    for t, spec in tables.items():
        env = generate_cdc_envelopes(spark, sf_dir, t, spec["pk"], spec.get("update_col"))
        frames.append(to_json_lines(env))
    if with_control:
        frames.append(to_json_lines(control_records(spark, list(tables))))
    if corrupt_lines:
        bad = spark.createDataFrame(
            [("{this is not json",), ('{"data": "truncated',)][:corrupt_lines], "value string"
        )
        frames.append(bad)
    all_lines = frames[0]
    for fdf in frames[1:]:
        all_lines = all_lines.unionByName(fdf)
    # repartition(n_files) is a demo-scale compaction knob, like the
    # reference's repartition(1) (README.md:304) but never hard-coded to 1.
    all_lines.repartition(n_files).write.mode("overwrite").text(out_dir)
    return out_dir


#: FIXTURES.md F2 table set (pk + CDC-updated numeric column).
DEFAULT_FIXTURE_TABLES: dict[str, dict] = {
    "customer": {"pk": "c_custkey", "update_col": "c_acctbal"},
    "orders": {"pk": "o_orderkey", "update_col": "o_totalprice"},
    "nation": {"pk": "n_nationkey", "update_col": None},
}
