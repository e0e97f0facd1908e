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


def autocorrelation(
    series: DataFrame,
    day_col: str = "day",
    value_col: str = "x",
    max_lag: int = 7,
) -> DataFrame:
    """Sample autocorrelation function of a daily series at lags
    1..``max_lag``: acf(k) = sum((x_t - mu)(x_{t+k} - mu)) / sum((x_t -
    mu)^2), with the full-series mean and denominator (the standard
    sample ACF). The one-number-per-lag seasonality detector: a weekly
    cycle shows as a spike at lag 7.

    ``series`` is the already-aggregated (day, value) frame — bounded by
    the calendar, not the corpus — so the self-join on the day offset and
    the 1-row stats broadcast are metadata-sized at any fact-table scale.
    Lag pairs come from an equi-join on ``date_add``, never a global
    window."""
    # two-pass: mean first (1 row), then centered moments against it
    mu = series.agg(F.avg(value_col).alias("__mu"))
    centered = series.crossJoin(F.broadcast(mu)).select(
        F.col(day_col).alias("__d"),
        (F.col(value_col) - F.col("__mu")).alias("__c"),
    )
    denom = centered.agg(F.sum(F.col("__c") * F.col("__c")).alias("__denom"))
    lags = series.sparkSession.range(1, max_lag + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    pairs = (
        centered.crossJoin(F.broadcast(lags))
        .alias("a")
        .join(
            centered.select(
                F.col("__d").alias("__d2"), F.col("__c").alias("__c2")
            ).alias("b"),
            F.expr("date_add(a.__d, a.lag) = b.__d2"),
        )
    )
    return (
        pairs.groupBy("lag")
        .agg(F.sum(F.col("__c") * F.col("__c2")).alias("__num"))
        .crossJoin(F.broadcast(denom))
        .select(
            "lag",
            # constant series: denominator 0, acf undefined -> NULL
            F.when(
                F.col("__denom") != 0,
                F.round(F.col("__num") / F.col("__denom"), 6),
            ).alias("acf"),
        )
    )


def theil_sen_slope(
    series: DataFrame, t_col: str = "t", value_col: str = "x"
) -> DataFrame:
    """Theil–Sen robust trend estimate over a (t, x) series: the MEDIAN of
    all pairwise slopes (x_j - x_i)/(t_j - t_i), i < j — unlike the OLS
    slope (``events_regression_slope``), up to ~29% of the points can be
    arbitrary outliers without moving it.

    The pair enumeration is quadratic IN THE SERIES LENGTH — which is the
    day-grain aggregate (90 days -> ~4k pairs), not the fact table, so the
    cross join is calendar-bounded at any corpus size. Returns one row
    (slope, n_pairs)."""
    a = series.select(
        F.col(t_col).cast("double").alias("__t1"),
        F.col(value_col).cast("double").alias("__x1"),
    )
    b = series.select(
        F.col(t_col).cast("double").alias("__t2"),
        F.col(value_col).cast("double").alias("__x2"),
    )
    slopes = (
        a.join(b, F.col("__t2") > F.col("__t1"))
        .select(
            ((F.col("__x2") - F.col("__x1")) / (F.col("__t2") - F.col("__t1"))).alias(
                "__slope"
            )
        )
    )
    return slopes.agg(
        F.round(F.expr("percentile(__slope, 0.5)"), 6).alias("slope"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    )


def stl_decompose(
    series: DataFrame,
    day_col: str = "day",
    value_col: str = "x",
    period: int = 7,
    trend_window: int = 7,
) -> DataFrame:
    """Classical seasonal decomposition of a daily series (the STL shape,
    moving-average flavor): trend = centered ``trend_window``-day moving
    average, seasonal = per-weekday mean of the detrended series centered
    to sum to ~zero, residual = x − trend − seasonal. One query answers
    "is this change trend, seasonality, or an anomaly?" — the residual is
    what an alerting rule should watch, not the raw series.

    Edge handling is the classical one: days whose centered window is
    PARTIAL (the first/last half-window) get a NULL trend — a partial
    average would bias the detrended series and leak trend into the
    seasonal estimate — so their seasonal still comes from the weekday
    means of the interior days, and their residual is NULL.

    Everything runs over the DAY-GRAIN aggregate: the ordered trend
    window and the final centering are global windows over a
    calendar-bounded frame (documented allowance, like events_wma_trend);
    the weekday means are a partitioned window. The weekday number is
    rebuilt from epoch-day arithmetic so it is engine-portable
    (1970-01-01 = Thursday = 4 in DuckDB's Sunday=0 numbering)."""
    half = trend_window // 2
    w_trend = Window.orderBy(day_col).rowsBetween(-half, half)
    epoch_day = F.datediff(F.col(day_col), F.lit("1970-01-01").cast("date"))
    whole = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    full = F.count(F.lit(1)).over(w_trend) == trend_window
    out = (
        series.withColumn(
            "trend", F.when(full, F.avg(value_col).over(w_trend))
        )
        .withColumn("__dow", F.pmod(epoch_day + 4, F.lit(period)))
        .withColumn("__det", F.col(value_col) - F.col("trend"))
        .withColumn("__sraw", F.avg("__det").over(Window.partitionBy("__dow")))
    )
    seasonal = F.col("__sraw") - F.avg("__sraw").over(whole)
    return out.select(
        day_col,
        value_col,
        F.round("trend", 6).alias("trend"),
        F.round(seasonal, 6).alias("seasonal"),
        F.round(F.col(value_col) - F.col("trend") - seasonal, 6).alias("residual"),
    )
