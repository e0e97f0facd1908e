"""Stream split / demultiplex — the reference repo's namesake operator.

One mixed multi-table CDC stream → N per-table flattened datasets
(reference README.md:257-309, 323). The reference does this with a Python
row-lambda filter + per-table rescans; the engine differs in exactly the two
ways SURVEY.md §3.2/§4.1 call out:

1. **Filters are Column expressions**, not Python lambdas — they stay inside
   Catalyst/Tungsten codegen and push down to the scan. (The reference's
   ``filter(f=lambda x: ...)`` forces every record through a Python worker,
   reference README.md:259-263.)
2. **Single-pass fan-out**: the envelope scan is materialized once
   (``persist``) and each table's filter+flatten+write runs against it —
   at 100 TB, N rescans of the source is N× the I/O bill. Per-table writes
   run concurrently from a thread pool (Spark schedulers are thread-safe;
   this is the engine analog of DMS's 8-table × 16-thread parallel load,
   reference README.md:119-137).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from split_kinesis_streams_with_glue_spark.envelope import SCHEMA_NAME, meta_col


def table_filter(
    table_name: str, schema_name: str = SCHEMA_NAME, drop_control: bool = True
):
    """P1 — the reference's record-selection predicate as a Column expr
    (reference README.md:259-263: schema-name == ..., table-name == ...,
    data is not null)."""
    cond = (meta_col("schema-name") == schema_name) & (meta_col("table-name") == table_name)
    if drop_control:
        cond = cond & F.col("data").isNotNull() & (meta_col("record-type") == "data")
    return cond


def flatten(env_df: DataFrame, keep_timestamp: bool = True) -> DataFrame:
    """P2 — strip the ``data.`` prefix, keep the provenance timestamp
    (reference README.md:278-279: ``select(col("data.*"),
    col("metadata.timestamp"))``)."""
    cols = [F.col("data.*")]
    if keep_timestamp:
        cols.append(meta_col("timestamp").alias("timestamp"))
    return env_df.select(*cols)


def split_one(
    env_df: DataFrame,
    table_name: str,
    schema_name: str = SCHEMA_NAME,
    keep_timestamp: bool = True,
    keep_operation: bool = False,
    prune: bool = True,
) -> DataFrame:
    """Extract one table's flattened records from the mixed envelope stream.

    With ``prune`` (default), columns of *other* tables — present in the
    union ``data`` schema the crawler-analog infers (image/image2.png) but
    never populated for this table — are dropped, so the per-table schema
    "emerges" post-filter exactly as in the reference (image/image4.png).
    """
    filtered = env_df.filter(table_filter(table_name, schema_name))
    extra = []
    if keep_operation:
        extra.append(meta_col("operation").alias("operation"))
    out = filtered.select(
        F.col("data.*"),
        *( [meta_col("timestamp").alias("timestamp")] if keep_timestamp else [] ),
        *extra,
    )
    if prune:
        out = prune_all_null_columns(out, protect={"timestamp", "operation"})
    return out


def prune_all_null_columns(
    df: DataFrame, protect: set[str] | None = None, sampling_fraction: float | None = None
) -> DataFrame:
    """Drop columns that are entirely null — the union-schema columns that
    belong to other tables.

    Cost: one aggregation producing a single row of non-null counts (map-side
    partial aggs, one tiny shuffle). At 100 TB pass ``sampling_fraction`` to
    decide on a sample; a column null in a 1% sample but populated in the tail
    would be mis-dropped, so full pass is the default and the sample is the
    explicit opt-in.
    """
    protect = protect or set()
    probe = df.sample(sampling_fraction) if sampling_fraction else df
    counts = probe.agg(
        *[F.count(F.col(f"`{c}`")).alias(c) for c in df.columns]
    ).collect()[0]
    keep = [c for c in df.columns if c in protect or counts[c] > 0]
    return df.select(*[F.col(f"`{c}`") for c in keep])


def discover_tables(env_df: DataFrame, schema_name: str = SCHEMA_NAME) -> list[str]:
    """Distinct table names present in the stream — the engine form of the
    DMS wildcard selection rule ``table-name: "%"`` (reference
    README.md:140-155). One partial-agg shuffle over a single string column."""
    rows = (
        env_df.filter(meta_col("schema-name") == schema_name)
        .select(meta_col("table-name").alias("t"))
        .distinct()
        .collect()
    )
    return sorted(r["t"] for r in rows)


def split_tables(
    env_df: DataFrame,
    tables: list[str] | str = "%",
    schema_name: str = SCHEMA_NAME,
    **kw,
) -> dict[str, DataFrame]:
    """T5 — demultiplex into {table_name: flattened DataFrame}.

    ``tables="%"`` discovers tables from the data (DMS wildcard rule)."""
    if tables == "%":
        tables = discover_tables(env_df, schema_name)
    return {t: split_one(env_df, t, schema_name, **kw) for t in tables}


def split_to_parquet(
    env_df: DataFrame,
    out_dir: str,
    tables: list[str] | str = "%",
    schema_name: str = SCHEMA_NAME,
    partition_by: dict[str, list[str]] | None = None,
    mode: str = "overwrite",
    max_parallel_writes: int = 8,
    persist_level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
    **kw,
) -> dict[str, str]:
    """Single-pass batch split: materialize the envelope scan once, then
    write every table's Parquet concurrently (S6 + R4).

    Output is Parquet+snappy — splittable row groups, unlike the reference's
    non-splittable 128 MB GZIP JSON objects (SURVEY.md §4.2). Returns
    {table_name: output_path}. ``partition_by`` maps table → partition
    columns (reference ``partitionKeys``, README.md:303-309); pick
    low-cardinality operational keys — the reference itself warns about its
    ``first_name`` demo choice (README.md:299).
    """
    env_df = env_df.persist(persist_level)
    try:
        frames = split_tables(env_df, tables, schema_name, **kw)
        partition_by = partition_by or {}
        paths = {}

        def write(item):
            t, df = item
            path = f"{out_dir}/{schema_name}/{t}"
            writer = df.write.mode(mode)
            if t in partition_by:
                writer = writer.partitionBy(*partition_by[t])
            writer.parquet(path)
            return t, path

        with ThreadPoolExecutor(max_workers=max_parallel_writes) as pool:
            for t, path in pool.map(write, frames.items()):
                paths[t] = path
        return paths
    finally:
        env_df.unpersist()


def split_stats(env_df: DataFrame) -> DataFrame:
    """Per-(schema, table, operation) record counts — the DMS console view
    (image/image3.png) as a query. Map-side partial aggregation; the shuffled
    key space is #tables × #ops, i.e. tiny at any scale."""
    return (
        env_df.filter(F.col("metadata").isNotNull())
        .groupBy(
            meta_col("schema-name").alias("schema_name"),
            meta_col("table-name").alias("table_name"),
            meta_col("operation").alias("operation"),
        )
        .agg(F.count(F.lit(1)).alias("n_records"))
    )
