"""Multi-dimensional clustering (Z-order) for scan locality.

A Hive-partitioned layout (operators/split.py) prunes on ONE column chain;
queries that filter on a *different* dimension still scan every file. The
standard lakehouse answer (Delta OPTIMIZE ZORDER, Iceberg sort orders) is to
sort data by an interleaved-bit space-filling curve over the hot filter
columns, so every file's per-column min/max footer stats form a tight
hyper-rectangle and a reader can skip files on ANY of the curve's
dimensions.

Everything here is codegen'd integer arithmetic (shift/and/or) — the
z-value is computable by any engine, which is exactly what makes it
oracle-checkable. Layout shape at scale: one range-shuffle on the z-value
(the same cost as any global sort Spark would run for a sorted write), then
file-local sorts; no UDFs, no driver state.

The curve: each dimension is min-max scaled to a 16-bit integer grid, the
bits are spread with the classic magic-number masks, and dimension ``i``
occupies bit positions ``i mod n`` — the textbook Morton code (Morton 1966,
the same construction Delta Lake's OPTIMIZE ZORDER documents).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPREAD_MASKS_2D = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def spread_bits_2d(x: Column) -> Column:
    """Spread a 16-bit value's bits to the even positions of a 32-bit word
    (x15 x14 ... x0  ->  0 x15 0 x14 ... 0 x0). Pure shift/and/or."""
    out = x.cast("bigint")
    for shift, mask in _SPREAD_MASKS_2D:
        out = (out.bitwiseOR(F.shiftleft(out, shift))).bitwiseAND(F.lit(mask))
    return out


def grid_scale(v: Column, lo: Column, hi: Column, bits: int = 16) -> Column:
    """Min-max scale ``v`` onto the ``2^bits`` integer grid. Constant
    columns land on cell 0; the top value lands on the last cell."""
    cells = (1 << bits) - 1
    span = hi.cast("double") - lo.cast("double")
    return F.when(span <= 0, F.lit(0).cast("bigint")).otherwise(
        F.least(
            F.lit(cells).cast("bigint"),
            F.floor((v.cast("double") - lo.cast("double")) * cells / span),
        )
    )


def zvalue_2d(a: Column, b: Column) -> Column:
    """Morton-interleave two 16-bit grid coordinates: ``a`` takes the even
    bits, ``b`` the odd bits of the 32-bit z-value."""
    return spread_bits_2d(a).bitwiseOR(F.shiftleft(spread_bits_2d(b), 1))


def with_zvalue(
    df: DataFrame, col_a: str, col_b: str, out: str = "zval"
) -> DataFrame:
    """Append the z-value of two numeric columns, min-max scaled from the
    frame's own global bounds (one tiny agg, broadcast back — never a
    single-partition window)."""
    bounds = df.agg(
        F.min(col_a).alias("__lo_a"),
        F.max(col_a).alias("__hi_a"),
        F.min(col_b).alias("__lo_b"),
        F.max(col_b).alias("__hi_b"),
    )
    ga = grid_scale(F.col(col_a), F.col("__lo_a"), F.col("__hi_a"))
    gb = grid_scale(F.col(col_b), F.col("__lo_b"), F.col("__hi_b"))
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(out, zvalue_2d(ga, gb))
        .drop("__lo_a", "__hi_a", "__lo_b", "__hi_b")
    )


def zorder_repartition(
    df: DataFrame, col_a: str, col_b: str, num_files: int
) -> DataFrame:
    """Cluster the frame along the z-curve into ``num_files`` range
    partitions (each becoming one tight-bounding-box file on write). The
    range shuffle samples the z distribution, so skewed dimensions still
    split evenly."""
    return (
        with_zvalue(df, col_a, col_b)
        .repartitionByRange(num_files, "zval")
        .sortWithinPartitions("zval")
    )


def bounding_boxes(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Per-partition min/max of both dimensions — the footer stats a reader
    would prune on. Diagnostic for tests/benchmarks: the z-ordered layout's
    boxes should overlap a small box predicate far less than a linearly
    sorted layout's."""
    return (
        df.select(F.spark_partition_id().alias("pid"), col_a, col_b)
        .groupBy("pid")
        .agg(
            F.min(col_a).alias("min_a"),
            F.max(col_a).alias("max_a"),
            F.min(col_b).alias("min_b"),
            F.max(col_b).alias("max_b"),
        )
    )


def write_clustered(
    df: DataFrame, path: str, col_a: str, col_b: str, num_files: int
) -> None:
    """Write ``df`` z-clustered into ``num_files`` files plus a min/max
    stats sidecar (``<path>/_stats``) — an explicit, engine-portable
    data-skipping index in the spirit of Delta's per-file stats.

    The sidecar is built with one narrow post-write scan of just the two
    clustered columns (column-pruned parquet read, grouped by
    ``input_file_name``); its size is one row per file regardless of data
    volume. The z-range shuffle guarantees each file's (a, b) bounding box
    is tight, which is what makes the sidecar selective."""
    clustered = zorder_repartition(df, col_a, col_b, num_files).drop("zval")
    clustered.write.mode("overwrite").parquet(f"{path}/data")
    spark = df.sparkSession
    stats = (
        spark.read.parquet(f"{path}/data")
        .select(F.input_file_name().alias("file"), col_a, col_b)
        .groupBy("file")
        .agg(
            F.min(col_a).alias("min_a"),
            F.max(col_a).alias("max_a"),
            F.min(col_b).alias("min_b"),
            F.max(col_b).alias("max_b"),
        )
        # the clustered column NAMES ride along so read_pruned can apply
        # the exact row predicate without the caller restating them
        .withColumn("col_a", F.lit(col_a))
        .withColumn("col_b", F.lit(col_b))
    )
    stats.coalesce(1).write.mode("overwrite").parquet(f"{path}/_stats")


def read_pruned(
    spark,
    path: str,
    a_range: tuple | None = None,
    b_range: tuple | None = None,
):
    """Read a ``write_clustered`` table, skipping every file whose stats
    box cannot intersect the requested ranges, then applying the exact
    inclusive range predicate to the surviving files' rows. The sidecar
    collect is metadata-sized (one row per file) and the file skip is
    purely an I/O optimization — the returned frame is row-identical to a
    full-scan BETWEEN filter on ANY combination of the two dimensions (the
    whole point of the 2-D curve), not a superset the caller must
    re-filter."""
    stats = spark.read.parquet(f"{path}/_stats")
    cond = F.lit(True)
    if a_range is not None:
        lo, hi = a_range
        cond = cond & (F.col("min_a") <= hi) & (F.col("max_a") >= lo)
    if b_range is not None:
        lo, hi = b_range
        cond = cond & (F.col("min_b") <= hi) & (F.col("max_b") >= lo)
    kept = stats.filter(cond).collect()
    schema = spark.read.parquet(f"{path}/data").schema
    if not kept:
        return spark.createDataFrame([], schema)
    name_a, name_b = kept[0]["col_a"], kept[0]["col_b"]
    df = spark.read.schema(schema).parquet(*[r["file"] for r in kept])
    if a_range is not None:
        df = df.filter(F.col(name_a).between(*a_range))
    if b_range is not None:
        df = df.filter(F.col(name_b).between(*b_range))
    return df


# 10-bit three-way interleave (x | x<<16 ... pattern), the standard 3-D
# Morton magic numbers: each step doubles the gap between bit groups.
_SPREAD_MASKS_3D = (
    (16, 0x030000FF),
    (8, 0x0300F00F),
    (4, 0x030C30C3),
    (2, 0x09249249),
)


def spread_bits_3d(x: Column) -> Column:
    """Spread a 10-bit value's bits to every third position of a 30-bit
    word. Same shift/and/or shape as the 2-D spread, different masks."""
    out = x.cast("bigint")
    for shift, mask in _SPREAD_MASKS_3D:
        out = (out.bitwiseOR(F.shiftleft(out, shift))).bitwiseAND(F.lit(mask))
    return out


def zvalue_3d(a: Column, b: Column, c: Column) -> Column:
    """Morton-interleave three 10-bit grid coordinates into a 30-bit
    z-value (a = bits 0,3,6,...; b = 1,4,7,...; c = 2,5,8,...)."""
    return (
        spread_bits_3d(a)
        .bitwiseOR(F.shiftleft(spread_bits_3d(b), 1))
        .bitwiseOR(F.shiftleft(spread_bits_3d(c), 2))
    )


def with_zvalue_3d(
    df: DataFrame, col_a: str, col_b: str, col_c: str, out: str = "zval"
) -> DataFrame:
    """Append the 3-D z-value (each dimension min-max scaled onto a 10-bit
    grid from the frame's global bounds). Three dimensions at 10 bits is
    the useful upper end of the curve: more dims on a fixed bit budget
    coarsen every dimension's grid and footer stats stop discriminating —
    past 3-4 hot columns, pick the hottest and Hive-partition the rest."""
    aggs = []
    for c in (col_a, col_b, col_c):
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    bounds = df.agg(*aggs)
    grids = [
        grid_scale(F.col(c), F.col(f"__lo_{c}"), F.col(f"__hi_{c}"), bits=10)
        for c in (col_a, col_b, col_c)
    ]
    drop = [f"__{p}_{c}" for c in (col_a, col_b, col_c) for p in ("lo", "hi")]
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(out, zvalue_3d(*grids))
        .drop(*drop)
    )
