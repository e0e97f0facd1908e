"""Time-series repair operators over aggregated (key, day, value) series.

The engine's gap handling comes in three grades: zero-fill (the
``events_timeseries_gapfill`` spine join — right for additive counts),
carry-forward (``last ... ignorenulls`` — right for state-like gauges),
and linear interpolation (this module — right for sampled continuous
measurements where a missing day means "not observed", not "zero").

Scale shape: everything here runs over the DAY-GRAIN AGGREGATE, never the
raw fact table — the expensive reduction (events → daily points) happens
first with map-side combine, and the window functions see a frame bounded
by (#keys × #days), kilobytes at any corpus size. One shuffle on the
series key; the spine is sequence()-exploded from a per-key min/max
aggregate, never a driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interpolate_gaps(
    df: DataFrame,
    key_col: str,
    day_col: str = "day",
    value_col: str = "value",
) -> DataFrame:
    """Densify a sparse per-key daily series and linearly interpolate the
    missing days between known neighbors.

    For each key the spine spans [min(day), max(day)]; a missing day gets
    ``prev + (next - prev) * gap_position`` where prev/next are the
    nearest known points (``last``/``first`` with ``ignorenulls`` over
    day-ordered frames). Days before the first or after the last known
    point carry the nearest known value (no extrapolation). The output
    marks synthesized rows with ``interpolated = true``.
    """
    known = df.select(
        F.col(key_col), F.col(day_col), F.col(value_col).alias("__v")
    )
    spine = (
        known.groupBy(key_col)
        .agg(F.min(day_col).alias("__lo"), F.max(day_col).alias("__hi"))
        .select(F.col(key_col), F.explode(F.sequence("__lo", "__hi")).alias(day_col))
    )
    j = spine.join(known, [key_col, day_col], "left")
    back = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    known_day = F.when(F.col("__v").isNotNull(), F.col(day_col))
    pv = F.last("__v", ignorenulls=True).over(back)
    pd_ = F.last(known_day, ignorenulls=True).over(back)
    nv = F.first("__v", ignorenulls=True).over(fwd)
    nd = F.first(known_day, ignorenulls=True).over(fwd)
    interp = pv + (nv - pv) * (
        F.datediff(F.col(day_col), pd_) / F.datediff(nd, pd_)
    )
    filled = (
        F.when(F.col("__v").isNotNull(), F.col("__v"))
        .when(pv.isNull(), nv)
        .when(nv.isNull(), pv)
        .otherwise(interp)
    )
    return j.select(
        F.col(key_col),
        F.col(day_col),
        filled.alias(value_col),
        F.col("__v").isNull().alias("interpolated"),
    )
