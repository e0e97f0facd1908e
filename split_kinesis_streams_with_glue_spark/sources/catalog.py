"""Catalog registration (S7) — the engine analog of the second Glue crawler
that makes split outputs queryable by name (reference README.md:312-314).

Spark's catalog gives Hive-style partition discovery for free; no MSCK
equivalent needed for path-registered tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def register_parquet(
    spark: SparkSession, name: str, path: str, temp: bool = True
) -> None:
    """Expose a Parquet dataset as a queryable table.

    ``temp`` registers a session-scoped view (test default). With
    ``temp=False`` an external table is created in the session catalog
    (``CREATE TABLE ... USING parquet LOCATION ...``) — the durable,
    Athena-table-like form.
    """
    if temp:
        spark.read.parquet(path).createOrReplaceTempView(name)
    else:
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {name} USING parquet LOCATION '{path}'"
        )


def register_testdata(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register the driver fixture tables as temp views for spark.sql use."""
    tables = tables or [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    for t in tables:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


def saveAsTable(df: DataFrame, name: str, partition_by: list[str] | None = None, mode: str = "overwrite") -> None:
    """Managed-table write + registration in one step."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.saveAsTable(name)


def analyze_table(
    spark: SparkSession, name: str, columns: list[str] | None = None
) -> None:
    """Collect table (and optionally column) statistics — the engine analog
    of keeping the Glue catalog's table stats fresh for the query planner.

    Row counts and total size feed join sizing in the static planner
    (broadcast-vs-shuffle decisions made before AQE sees runtime sizes);
    column stats (NDV, min/max, null counts) additionally enable CBO join
    reordering when ``spark.sql.cbo.enabled`` is on. At 100 TB a stale
    size estimate is the difference between broadcasting a 10 GB "dim" and
    planning it correctly — run this after every large write, it scans
    file footers, not data (row/size), and one pass for column stats.
    Catalog tables only (path-based reads derive sizes from the files
    themselves)."""
    spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(columns)
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR COLUMNS {cols}")
