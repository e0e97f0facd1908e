"""One-pass table profiling — per-column null/distinct/bounds/length stats.

The first thing run against any newly landed 100 TB table is a profile, and
the naive way (one query per column) rescans the data #columns times. This
operator folds every column's metrics into ONE aggregation job: Catalyst
plans the multiple exact ``count_distinct`` via a single Expand + two-level
aggregate, so the input is read once; the result is one row, pivoted to
a (column, metric...) frame driver-side-free with an explode over an
inline-constructed array.

Metric choices are deliberately engine-portable (the registry oracle
recomputes them in DuckDB): exact distinct counts, string-cast min/max
(numeric columns here are integers, so the cast is format-stable), and the
exact SUM of rendered lengths (the mean is sum/n, but the sum is an integer
— no cross-engine rounding semantics to reconcile).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Profile ``cols`` (default: all) in one scan. Output columns:
    column, n_rows, n_nulls, n_distinct, min_s, max_s, sum_len."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        rendered = F.col(c).cast("string")
        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
            F.sum(F.length(rendered)).cast("bigint").alias(f"{c}__sumlen"),
        ]
    one = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n_rows").alias("n_rows"),
                F.coalesce(F.col(f"{c}__nulls"), F.lit(0)).alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_s"),
                F.col(f"{c}__max").alias("max_s"),
                F.col(f"{c}__sumlen").alias("sum_len"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(entries).alias("p")).select("p.*")
