"""Write-audit-publish: gated, atomic table publication.

The production discipline for any pipeline output (split tables, training
corpus snapshots): never let readers observe a half-written or
constraint-violating dataset. Writes land in a VERSIONED directory
(``path/v=N``), the audit (quality_checks) runs against the staged files
exactly as readers would see them, and only a passing audit moves the
``_CURRENT`` pointer — a one-file atomic marker write (temp+rename via the
Hadoop FS API, streaming/markers.py), safe on HDFS and local FS and
no-torn-file on S3A. Readers resolve the pointer and read that version;
a failed audit leaves the pointer (and therefore every reader) on the
last good version; the rejected files stay in their version slot for
debugging until the next publish attempt overwrites that slot.

This is the table-format-free analog of Iceberg's WAP / Delta's
constraint-checked commit: versions instead of snapshots, a marker
instead of a transaction log. Cost: the audit's one aggregation pass
(+ one anti-join per referential check) before each publish.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from split_kinesis_streams_with_glue_spark.operators.quality_checks import check_table
from split_kinesis_streams_with_glue_spark.streaming.markers import (
    read_marker,
    write_marker,
)


class PublishBlocked(Exception):
    """Raised when the audit fails; carries the audit frame's rows."""

    def __init__(self, failures):
        self.failures = failures
        super().__init__(
            "publish blocked by failed checks: "
            + ", ".join(f"{c} (observed {v})" for c, v, _ in failures)
        )


def write_audit_publish(
    df: DataFrame,
    path: str,
    checks: list,
    partition_by: list[str] | None = None,
) -> int:
    """Stage ``df`` as the next version under ``path``, audit the staged
    files, and atomically move the ``_CURRENT`` pointer on success.
    Returns the published version number; raises ``PublishBlocked`` (and
    leaves the pointer untouched) on audit failure."""
    spark = df.sparkSession
    marker = f"{path}/_CURRENT"
    current = read_marker(spark, marker)
    version = (current or 0) + 1
    staged = f"{path}/v={version}"
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staged)
    # audit what readers would actually read: the staged files
    audit = check_table(spark.read.parquet(staged), checks)
    failures = [
        (r["check"], r["observed"], r["passed"])
        for r in audit.collect()  # metadata-sized: one row per check
        if not r["passed"]
    ]
    if failures:
        raise PublishBlocked(failures)
    write_marker(spark, marker, version)
    return version


def read_published(spark: SparkSession, path: str) -> DataFrame:
    """Read the currently published version (raises if nothing published)."""
    current = read_marker(spark, f"{path}/_CURRENT")
    if current is None:
        raise FileNotFoundError(f"nothing published under {path}")
    return spark.read.parquet(f"{path}/v={current}")


def read_version(spark: SparkSession, path: str, version: int) -> DataFrame:
    """Time travel: read a specific published (or still-staged) version.
    Every publish keeps its ``path/v=N`` slot on disk, so any historical
    snapshot remains addressable by number — the version directory IS the
    snapshot, no transaction-log replay needed. Raises if the slot was
    never written."""
    return spark.read.parquet(f"{path}/v={version}")


def current_version(spark: SparkSession, path: str) -> int | None:
    """The version readers currently resolve to (None before first
    publish). A failed audit never moves this, so ``current_version`` can
    trail the highest ``v=N`` directory on disk — that gap is the staged,
    unpublished work."""
    return read_marker(spark, f"{path}/_CURRENT")


def vacuum_versions(spark: SparkSession, path: str, keep_last: int = 2) -> list[int]:
    """Expire old snapshots: delete version slots older than the newest
    ``keep_last``, NEVER the currently published one (time travel to kept
    versions keeps working; storage stops growing unboundedly). Returns the
    versions removed. Metadata-sized driver work: one directory listing."""
    from split_kinesis_streams_with_glue_spark.streaming.markers import _fs as _fs_path

    current = read_marker(spark, f"{path}/_CURRENT")
    fs, root, _ = _fs_path(spark, path)
    versions = sorted(
        int(st.getPath().getName().split("=", 1)[1])
        for st in fs.listStatus(root)
        if st.isDirectory() and st.getPath().getName().startswith("v=")
    )
    keep = set(versions[-keep_last:]) if keep_last > 0 else set()
    if current is not None:
        keep.add(current)
    removed: list[int] = []
    for v in versions:
        if v in keep:
            continue
        fs.delete(_fs_path(spark, f"{path}/v={v}")[1], True)
        removed.append(v)
    return removed


def write_audit_publish_group(
    tables: dict[str, tuple[DataFrame, list]],
    path: str,
) -> int:
    """Cross-table ATOMIC write-audit-publish: stage every table of the
    group as ``path/<table>/v=N`` under ONE shared version number, audit
    each staged table, and only if EVERY audit passes advance the single
    group-level ``_CURRENT`` marker. Readers resolve all tables through
    that one marker, so any pair of tables they join comes from the same
    consistent snapshot — a new ``customer`` can never be joined against
    last snapshot's ``orders``. A failed audit on ANY table blocks ALL of
    them (the staged slots stay on disk for debugging, readers stay on
    the previous group version) — the cross-table transaction semantics
    single-table WAP cannot give.

    ``tables`` maps table name → (DataFrame, checks). Returns the
    published group version; raises ``PublishBlocked`` with per-table
    check names on failure."""
    assert tables, "empty publish group"
    spark = next(iter(tables.values()))[0].sparkSession
    marker = f"{path}/_CURRENT"
    version = (read_marker(spark, marker) or 0) + 1
    failures = []
    for name, (df, checks) in tables.items():
        staged = f"{path}/{name}/v={version}"
        df.write.mode("overwrite").parquet(staged)
        audit = check_table(spark.read.parquet(staged), checks)
        failures.extend(
            (f"{name}.{r['check']}", r["observed"], r["passed"])
            for r in audit.collect()  # metadata-sized: one row per check
            if not r["passed"]
        )
    if failures:
        raise PublishBlocked(failures)
    write_marker(spark, marker, version)
    return version


def read_published_group(spark: SparkSession, path: str, table: str) -> DataFrame:
    """Read one table of the currently published group snapshot. Every
    table read through the same group marker is version-consistent with
    every other."""
    current = read_marker(spark, f"{path}/_CURRENT")
    if current is None:
        raise FileNotFoundError(f"nothing published under {path}")
    return spark.read.parquet(f"{path}/{table}/v={current}")
