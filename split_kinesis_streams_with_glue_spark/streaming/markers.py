"""Filesystem-agnostic commit markers for foreachBatch idempotence guards.

foreachBatch is at-least-once: after a crash the same (batch, id) is
re-delivered, and a non-transactional sink that already appended it would
double-write on replay. Sinks here record the last applied batch/epoch id in
a tiny underscore-prefixed marker file next to the data (underscore ⇒
ignored by Hadoop input listings and Spark's file readers) and skip ids at
or below it.

The marker goes through the Hadoop FileSystem API, not ``open()``: the
output path may be HDFS/S3A/local, and a driver-local ``open()`` on such a
path silently never finds the marker (guard dead) and fails the write. The
write is create-temp-then-rename — rename is atomic on HDFS and local
filesystems; on S3A it degrades to copy+delete, which still never exposes a
torn file, only (worst case) a momentarily missing one, and a missing marker
merely re-applies one epoch — the documented best-effort bound.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, p, jvm


def read_text_marker(spark: SparkSession, path: str) -> str | None:
    """Text recorded at ``path``, or None if never written."""
    fs, p, jvm = _fs(spark, path)
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        ).strip()
    finally:
        stream.close()


def write_text_marker(spark: SparkSession, path: str, text: str) -> None:
    """Atomically record ``text`` at ``path`` (temp file + rename)."""
    fs, p, jvm = _fs(spark, path)
    tmp = jvm.org.apache.hadoop.fs.Path(path + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    if fs.exists(p):
        fs.delete(p, False)  # rename refuses to clobber on HDFS
    if not fs.rename(tmp, p):
        raise IOError(f"marker rename failed: {tmp} -> {p}")


def read_marker(spark: SparkSession, path: str) -> int | None:
    """Last committed id recorded at ``path``, or None if never written."""
    text = read_text_marker(spark, path)
    return int(text) if text else None


def write_marker(spark: SparkSession, path: str, value: int) -> None:
    """Atomically record ``value`` at ``path`` (temp file + rename)."""
    write_text_marker(spark, path, str(value))
