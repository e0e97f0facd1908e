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


def spearman_corr(
    series: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """Spearman rank correlation between two columns of a bounded series
    frame: Pearson correlation of the midranks, with exact average ranks
    for ties (rho = corr(rank(x), rank(y))). The monotonic-association
    companion to the Pearson ``corr`` built-in — robust to outliers and to
    any monotone rescaling, the standard screen for "does volume move
    with value at all?" before fitting anything linear.

    Ranking needs a total order, so this operator is deliberately scoped
    to SERIES-GRAIN frames (a day-grain aggregate, a bin histogram, a
    per-group summary) — calendar/bin-bounded, never data-sized; the two
    rank windows are global-but-bounded (documented allowance class).
    Midranks via the classic RANK() identity: midrank = rank +
    (tie_count - 1)/2. Returns one row (spearman_rho, n); NULL rho when
    either column is constant (zero variance — undefined)."""
    ranked = series.select(
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
    )
    for c in ("__x", "__y"):
        w = Window.orderBy(c)
        tie = Window.partitionBy(c)
        ranked = ranked.withColumn(
            f"__r{c}",
            F.rank().over(w) + (F.count(F.lit(1)).over(tie) - 1) / 2.0,
        )
    # Pearson-of-ranks from sufficient statistics, NOT F.corr: under ANSI
    # mode corr's internal division throws on a zero-variance (constant)
    # column instead of yielding NULL — the guarded form is ANSI-safe and
    # algebraically identical
    s = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("__r__x").alias("sx"),
        F.sum("__r__y").alias("sy"),
        F.sum(F.col("__r__x") * F.col("__r__y")).alias("sxy"),
        F.sum(F.col("__r__x") * F.col("__r__x")).alias("sxx"),
        F.sum(F.col("__r__y") * F.col("__r__y")).alias("syy"),
    )
    n = F.col("n")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    return s.select(
        F.when((vx > 0) & (vy > 0), F.round(cov / F.sqrt(vx * vy), 6)).alias(
            "spearman_rho"
        ),
        n.cast("bigint").alias("n"),
    )


def mann_kendall(
    series: DataFrame, t_col: str = "t", value_col: str = "x"
) -> DataFrame:
    """Mann–Kendall trend test over a (t, x) series: S = Σ_{i<j}
    sign(x_j − x_i), with the normal-approximation z using the
    tie-corrected variance Var(S) = [n(n−1)(2n+5) − Σ t(t−1)(2t+5)]/18
    and the ±1 continuity correction. The nonparametric "is there ANY
    monotone trend?" gate that pairs with ``theil_sen_slope`` (which
    estimates the trend this test detects) — robust where an OLS-slope
    t-test is wrecked by outliers or non-normal noise.

    Same scale contract as Theil–Sen: the pair join is quadratic in the
    SERIES length (calendar-bounded), never in the fact table. Returns
    one row (s_statistic, z_score, n); z is NULL for n < 2 or an
    all-tied series (variance 0)."""
    a = series.select(
        F.col(t_col).alias("__t1"), F.col(value_col).cast("double").alias("__x1")
    )
    b = series.select(
        F.col(t_col).alias("__t2"), F.col(value_col).cast("double").alias("__x2")
    )
    s_agg = (
        a.join(b, F.col("__t2") > F.col("__t1"))
        .agg(F.sum(F.signum(F.col("__x2") - F.col("__x1"))).alias("s"))
    )
    ties = (
        series.groupBy(F.col(value_col).cast("double").alias("__v"))
        .agg(F.count(F.lit(1)).cast("double").alias("__t"))
        .agg(
            F.sum(
                F.col("__t") * (F.col("__t") - 1) * (2 * F.col("__t") + 5)
            ).alias("tie_term"),
            F.sum("__t").alias("n"),
        )
    )
    joined = s_agg.crossJoin(F.broadcast(ties))
    n = F.col("n")
    var_s = (n * (n - 1) * (2 * n + 5) - F.col("tie_term")) / 18.0
    # continuity correction: z = (S - sign(S)) / sqrt(Var), 0 when S = 0
    z = F.when(
        F.col("s") > 0, (F.col("s") - 1) / F.sqrt(var_s)
    ).when(F.col("s") < 0, (F.col("s") + 1) / F.sqrt(var_s)).otherwise(0.0)
    return joined.select(
        F.col("s").cast("bigint").alias("s_statistic"),
        F.when((n > 1) & (var_s > 0), F.round(z, 6)).alias("z_score"),
        n.cast("bigint").alias("n"),
    )


def gini_lorenz(series: DataFrame, value_col: str) -> DataFrame:
    """Gini coefficient of a non-negative series (Lorenz-curve area form):
    G = 2·Σ i·x_(i) / (n·Σx) − (n+1)/n over the ascending order
    statistics — the inequality measure for "how concentrated is volume
    across days/sources/shards?". 0 = perfectly even, →1 = one unit
    carries everything. Distinct from ``events_type_gini``'s gini
    IMPURITY (1 − Σp², a diversity index); this is the econometric
    concentration coefficient.

    The ordering runs over a SERIES-GRAIN frame (days, sources, buckets —
    bounded), not data rows; ties get deterministic order via the value
    sort (the statistic is tie-order invariant: equal values contribute
    identically whichever of the tied ranks they take). Returns one row
    (gini, n); NULL when the total is 0 (undefined share structure)."""
    w = Window.orderBy(F.col(value_col).cast("double"))
    ranked = series.select(
        F.col(value_col).cast("double").alias("__x"),
        F.row_number().over(w).alias("__i"),
    )
    return ranked.agg(
        F.when(
            F.sum("__x") > 0,
            F.round(
                2.0 * F.sum(F.col("__i") * F.col("__x"))
                / (F.count(F.lit(1)) * F.sum("__x"))
                - (F.count(F.lit(1)) + 1.0) / F.count(F.lit(1)),
                6,
            ),
        ).alias("gini"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )


def kendall_tau_b(
    series: DataFrame, x_col: str, y_col: str, key_col: str
) -> DataFrame:
    """Kendall's tau-b between two columns of a bounded series frame:
    (C − D) / sqrt((n0 − t_x)(n0 − t_y)) over all pairs, with the tie
    corrections in the denominator. The pairwise-concordance companion to
    ``spearman_corr`` — tau has a direct probabilistic reading (P(agree)
    − P(disagree)) and is the more robust of the two under heavy ties.

    Same scale contract as Theil–Sen/Mann–Kendall: the pair join is
    quadratic in the SERIES length (day-grain/bin-grain — bounded), never
    the fact table; tie counts fold from per-column value histograms.
    ``key_col`` (the day/bin key — unique per row) enumerates each
    unordered pair exactly once; the statistic itself is key-order
    invariant. Returns one row (tau_b, n_concordant, n_discordant, n);
    NULL tau when either column is fully tied (denominator 0)."""
    base = series.select(
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
        F.col(key_col).alias("__i"),
    )
    a = base.select(
        F.col("__i").alias("__i1"),
        F.col("__x").alias("__x1"),
        F.col("__y").alias("__y1"),
    )
    b = base.select(
        F.col("__i").alias("__i2"),
        F.col("__x").alias("__x2"),
        F.col("__y").alias("__y2"),
    )
    prod = F.signum(F.col("__x2") - F.col("__x1")) * F.signum(
        F.col("__y2") - F.col("__y1")
    )
    cd = (
        a.join(b, F.col("__i2") > F.col("__i1"))
        .agg(
            F.sum(F.when(prod > 0, 1).otherwise(0)).alias("c"),
            F.sum(F.when(prod < 0, 1).otherwise(0)).alias("d"),
        )
    )

    def tie_pairs(col: str):
        return (
            base.groupBy(col)
            .agg(F.count(F.lit(1)).cast("double").alias("__t"))
            .agg(
                F.sum(F.col("__t") * (F.col("__t") - 1) / 2).alias("tp"),
                F.sum("__t").alias("n"),
            )
        )

    tx = tie_pairs("__x").select(
        F.col("tp").alias("tx"), F.col("n").alias("n")
    )
    ty = tie_pairs("__y").select(F.col("tp").alias("ty"))
    j = cd.crossJoin(F.broadcast(tx)).crossJoin(F.broadcast(ty))
    n0 = F.col("n") * (F.col("n") - 1) / 2
    denom = (n0 - F.col("tx")) * (n0 - F.col("ty"))
    return j.select(
        F.when(
            denom > 0,
            F.round((F.col("c") - F.col("d")) / F.sqrt(denom), 6),
        ).alias("tau_b"),
        F.col("c").cast("bigint").alias("n_concordant"),
        F.col("d").cast("bigint").alias("n_discordant"),
        F.col("n").cast("bigint").alias("n"),
    )


def rolling_zscore(
    series: DataFrame,
    day_col: str = "day",
    value_col: str = "x",
    window: int = 7,
    threshold: float = 2.0,
) -> DataFrame:
    """Trailing-window anomaly score for a daily series: each day's value
    against the mean/std of the PRECEDING ``window`` days (never itself —
    a spike must not dilute its own baseline). The day-grain anomaly
    detector that complements CUSUM (sequential drift) and STL residuals
    (seasonality-aware): one number a paging rule can threshold.

    z is NULL until a full baseline window exists and when the baseline
    std is 0 (constant history — any deviation is 'infinitely' surprising
    and the score is undefined; the flag still fires via the mean test).
    Windows run over the calendar-bounded day frame (documented allowance
    class). Returns (day, value, mean_prev, std_prev, z, anomaly)."""
    w = Window.orderBy(day_col).rowsBetween(-window, -1)
    base = series.select(
        F.col(day_col),
        F.col(value_col).cast("double").alias("__x"),
        F.count(F.lit(1)).over(w).alias("__n"),
        F.avg(F.col(value_col).cast("double")).over(w).alias("__m"),
        F.stddev_samp(F.col(value_col).cast("double")).over(w).alias("__s"),
    )
    full = F.col("__n") == window
    z = F.when(full & (F.col("__s") > 0), (F.col("__x") - F.col("__m")) / F.col("__s"))
    return base.select(
        day_col,
        F.col("__x").alias(value_col),
        F.when(full, F.round("__m", 6)).alias("mean_prev"),
        F.when(full, F.round("__s", 6)).alias("std_prev"),
        F.round(z, 6).alias("z"),
        F.coalesce(F.abs(z) > threshold, F.lit(False)).alias("anomaly"),
    )


def hodges_lehmann(
    series: DataFrame, value_col: str, key_col: str
) -> DataFrame:
    """Hodges–Lehmann pseudo-median of a bounded series: the median of
    all Walsh averages (x_i + x_j)/2 over i ≤ j — the robust LOCATION
    estimate that pairs with Theil–Sen (robust slope) and the rank tests
    (robust comparison): ~29% arbitrary outliers move it nowhere, yet on
    clean symmetric data it is ~95% as efficient as the mean (the plain
    median is ~64%).

    Same scale contract as the other pairwise operators: the Walsh-pair
    enumeration is quadratic in the SERIES length (day-grain — bounded),
    never the fact table; ``key_col`` (unique per row) enumerates each
    unordered pair once — pairing on VALUE comparison would double-count
    tied values. i = j contributes the values themselves. Returns one
    row (hl_estimate, n_pairs)."""
    a = series.select(
        F.col(key_col).alias("__k1"), F.col(value_col).cast("double").alias("__x1")
    )
    b = series.select(
        F.col(key_col).alias("__k2"), F.col(value_col).cast("double").alias("__x2")
    )
    pairs = a.join(b, F.col("__k2") > F.col("__k1")).select(
        ((F.col("__x1") + F.col("__x2")) / 2).alias("__w")
    )
    selfs = series.select(F.col(value_col).cast("double").alias("__w"))
    walsh = pairs.unionByName(selfs)
    return walsh.agg(
        F.round(F.expr("percentile(__w, 0.5)"), 6).alias("hl_estimate"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    )


def interarrival_cv(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Inter-arrival-time coefficient of variation per key group: gaps
    between consecutive events within each (user, type, ...) stream, then
    per-FIRST-key-column mean gap and CV = std/mean. The burstiness
    diagnostic at the event grain (the Fano factor works on daily
    counts): CV ≈ 1 is Poisson-like arrivals, CV ≫ 1 is bursts/batch
    flushes, CV ≪ 1 is a scheduler's heartbeat — each implying a
    different ingest-buffer sizing.

    Gaps come from a lag window PARTITIONED by the full key tuple
    (scales — never a global window) in exact integer microseconds; the
    variance folds from DECIMAL-exact sufficient statistics (Σg fits
    int64 but Σg² does not fit a double's 53-bit mantissa, so doubles
    would drift with partition order) and only the final sqrt/divisions
    run in float, in one fixed order. Returns per-group (key, n_gaps,
    mean_gap_s, cv); CV is NULL for < 2 gaps or a zero mean."""
    order = [F.col(ts_col)]
    if order_tiebreak:
        order.append(F.col(order_tiebreak))
    w = Window.partitionBy(*key_cols).orderBy(*order)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gaps = (
        events.withColumn("__us", us)
        .withColumn("__gap", F.col("__us") - F.lag("__us").over(w))
        .filter(F.col("__gap").isNotNull())
    )
    stats = gaps.groupBy(key_cols[0]).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum(F.col("__gap").cast("decimal(38,0)")).alias("__s"),
        # cast BEFORE multiplying: a month-long gap in µs squares past
        # int64, and ANSI mode throws on long overflow
        F.sum(
            F.col("__gap").cast("decimal(19,0)")
            * F.col("__gap").cast("decimal(19,0)")
        ).alias("__ss"),
    )
    n = F.col("n_gaps").cast("double")
    num = (
        F.col("n_gaps").cast("decimal(38,0)") * F.col("__ss")
        - F.col("__s") * F.col("__s")
    ).cast("double")
    s = F.col("__s").cast("double")
    mean = s / n
    # sample std: sqrt((n*ss - s^2) / (n*(n-1)))
    cv = F.sqrt(num / (n * (n - 1))) / mean
    return stats.select(
        key_cols[0],
        F.col("n_gaps").cast("bigint").alias("n_gaps"),
        F.round(mean / 1e6, 6).alias("mean_gap_s"),
        F.when((F.col("n_gaps") > 1) & (s > 0), F.round(cv, 6)).alias("cv"),
    )


def isotonic_fit(
    series: DataFrame, key_col: str, num_col: str, den_col: str
) -> DataFrame:
    """Weighted isotonic (monotone nondecreasing) regression over a
    BOUNDED ordered series — the best least-squares monotone
    approximation of y_k = num_k/den_k with weights den_k (Robertson,
    Wright & Dykstra 1988). The shape-constrained smoother the trend
    family lacked: calibration curves, dose-response-style
    quality-vs-keep-rate curves, and "this metric should only grow"
    trend extraction all need the closest MONOTONE fit, not a linear or
    moving-average one.

    Implemented via the minimax characterization
    ``fit_k = max_{i<=k} min_{j>=k} avg(i..j)`` rather than the
    sequential pool-adjacent-violators walk: PAVA's stack is inherently
    serial, but the minimax form is three set-oriented steps — prefix
    sums over the series, the O(D^2) (i, j) segment-average frame, a
    suffix-min window per start index, and a per-k max fold. Quadratic
    in the SERIES length only (calendar-grain, never event-grain — the
    same documented contract as mann_kendall/hodges_lehmann), and every
    segment average is one IEEE division of exact integer sums, so the
    whole fit is engine-exact before the final rounding.

    ``num_col``/``den_col`` must be exact integers (pre-scale decimals
    to cents upstream). Returns (key_col, n, mean, fit) with mean/fit as
    RAW doubles in num/den units — callers rescale and round."""
    w_ord = Window.orderBy(key_col)
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    base = series.select(
        F.col(key_col),
        F.col(num_col).alias("__sv"),
        F.col(den_col).alias("__nv"),
        F.row_number().over(w_ord).alias("__k"),
        F.sum(num_col).over(w_cum).alias("__cs"),
        F.sum(den_col).over(w_cum).alias("__cn"),
    )
    i = base.select(
        F.col("__k").alias("__i"),
        (F.col("__cs") - F.col("__sv")).alias("__Si0"),
        (F.col("__cn") - F.col("__nv")).alias("__Ni0"),
    )
    j = base.select(
        F.col("__k").alias("__j"),
        F.col("__cs").alias("__Sj"),
        F.col("__cn").alias("__Nj"),
    )
    avg = (F.col("__Sj") - F.col("__Si0")) / (F.col("__Nj") - F.col("__Ni0"))
    w_suff = (
        Window.partitionBy("__i")
        .orderBy(F.col("__j").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    amin = (
        i.join(j, F.col("__i") <= F.col("__j"))
        .select("__i", "__j", avg.alias("__avg"))
        .select("__i", "__j", F.min("__avg").over(w_suff).alias("__A"))
    )
    fit = amin.groupBy("__j").agg(F.max("__A").alias("__fit"))
    return base.join(fit, base["__k"] == fit["__j"]).select(
        key_col,
        F.col("__nv").cast("bigint").alias("n"),
        (F.col("__sv") / F.col("__nv")).alias("mean"),
        F.col("__fit").alias("fit"),
    )


def kaplan_meier(durations: DataFrame, dur_col: str, event_col: str) -> DataFrame:
    """Kaplan–Meier product-limit survival estimator (Kaplan & Meier,
    JASA 1958) over right-censored durations — the survival-analysis
    entry the event family lacked: "what fraction of users is still
    active after t days", honestly accounting for users whose outcome
    is not yet known (censored), which a naive retention ratio silently
    treats as churned.

    Input is one row per subject: an integer duration and a 0/1 event
    flag (1 = the terminal event was OBSERVED, 0 = censored). The
    corpus collapses to the per-duration frame first (one groupBy — the
    only data-sized shuffle); at-risk counts are a suffix sum and the
    product limit S(t) = prod_{t'<=t} (1 - d/n) folds as
    exp(sum ln(1-d/n)) over the bounded duration frame, with an exact
    zero-factor flag so a step to zero survival never routes through
    ln(0) (engine-divergent: NULL in Spark, -inf in DuckDB). Every
    factor is one IEEE division of integer counts; only ln/exp differ
    in the last ulp (absorbed by rounding).

    Returns one row per distinct duration (t, n_at_risk, n_events,
    survival), censored-only durations included (d = 0 — survival
    unchanged, at-risk still drops)."""
    byt = durations.groupBy(F.col(dur_col).alias("__t")).agg(
        F.count(F.lit(1)).alias("__c"),
        F.sum(F.col(event_col)).alias("__d"),
    )
    w_suff = Window.orderBy(F.col("__t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    r = byt.select(
        "__t", "__d", F.sum("__c").over(w_suff).alias("__n")
    )
    factor = F.lit(1) - F.col("__d") / F.col("__n")
    w_pref = Window.orderBy(F.col("__t").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    fin = r.select(
        "__t",
        "__d",
        "__n",
        F.max(F.when(factor == 0, 1).otherwise(0)).over(w_pref).alias("__zf"),
        F.sum(F.when(factor > 0, F.log(factor)).otherwise(F.lit(0.0)))
        .over(w_pref)
        .alias("__ls"),
    )
    return fin.select(
        F.col("__t").cast("int").alias("t"),
        F.col("__n").cast("bigint").alias("n_at_risk"),
        F.col("__d").cast("bigint").alias("n_events"),
        F.when(F.col("__zf") == 1, F.lit(0.0))
        .otherwise(F.round(F.exp("__ls"), 6))
        .alias("survival"),
    )


def changepoint_mean(
    series: DataFrame, t_col: str = "t", value_col: str = "x"
) -> DataFrame:
    """Single mean-shift changepoint by binary segmentation (Scott &
    Knott 1974; the one-split step of PELT-style segmentation): over
    every candidate split t, score the SSE reduction of modeling the
    series as two constant segments instead of one —
    gain(t) = nl*nr/n * (mean_left - mean_right)^2 — and return the
    argmax. The retrospective "WHEN did the level shift?" answer the
    monitoring family lacked: CUSUM and EWMA detect drift as it streams
    past a threshold; binary segmentation localizes the single most
    likely break in a recorded window, which is what an incident
    review asks.

    Shape contract (the regression twin of info_gain_split's
    classification split): the series is already a calendar-grain
    aggregate, cumulative sums run over that bounded frame, and the
    argmax is a TakeOrderedAndProject on the rounded gain with the
    earlier split as tiebreak. All sums are plain doubles folded in a
    fixed association order mirrored by the SQL oracle. Returns one row
    (split_t, n_left, n_right, mean_left, mean_right, sse_gain)."""
    from pyspark.sql import Window

    w = Window.orderBy(F.col(t_col)).rowsBetween(Window.unboundedPreceding, 0)
    x = F.col(value_col).cast("double")
    cum = series.select(
        F.col(t_col).alias("__t"),
        F.count(F.lit(1)).over(w).alias("__nl"),
        F.sum(x).over(w).alias("__sl"),
    )
    tot = series.agg(
        F.count(F.lit(1)).alias("__n"), F.sum(x).alias("__s")
    )
    nl = F.col("__nl").cast("double")
    nr = (F.col("__n") - F.col("__nl")).cast("double")
    ml = F.col("__sl") / nl
    mr = (F.col("__s") - F.col("__sl")) / nr
    gain = nl * nr / F.col("__n").cast("double") * (ml - mr) * (ml - mr)
    return (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("__nl") < F.col("__n"))
        .select(
            F.col("__t").alias("split_t"),
            F.col("__nl").cast("bigint").alias("n_left"),
            (F.col("__n") - F.col("__nl")).cast("bigint").alias("n_right"),
            F.round(ml, 6).alias("mean_left"),
            F.round(mr, 6).alias("mean_right"),
            F.round(gain, 6).alias("sse_gain"),
        )
        .orderBy(F.col("sse_gain").desc(), F.col("split_t").asc())
        .limit(1)
    )

def cross_correlation(
    series: DataFrame,
    day_col: str,
    x_col: str,
    y_col: str,
    max_lag: int = 7,
) -> DataFrame:
    """Lagged cross-correlation between two daily INTEGER series (Box &
    Jenkins, "Time Series Analysis", 1970 §11.1): ccf(l) = Pearson
    r(x_t, y_{t+l}) for l in −max_lag..+max_lag, each lag over its own
    overlap window (the standard sample CCF). The lead/lag detector
    autocorrelation can't give: a peak at POSITIVE l says x LEADS y by
    l days (views today predict purchases in l days); the asymmetry
    around 0 is the direction of the dependency.

    ``series`` is the already-aggregated (day, x, y) frame — calendar-
    bounded — and is pinned with ``localCheckpoint`` so its (possibly
    corpus-scale) lineage is not re-embedded on both sides of the lag
    self-join: the day-grain reduction really is the only corpus pass.
    The moment products are formed IN DECIMAL(38,0) — one operand cast
    before the multiply — so x·y / x² / y² are exact at any count
    magnitude (a long·long product would overflow int64 at daily
    counts ≥ ~3e9); the sums are therefore exact and order-free, and
    the correlation itself is one double expression per lag. Rows with
    a NULL x (resp. y) are excluded from that side — pairwise-complete
    semantics, so ``n_days`` counts exactly the pairs the moments use
    (a full-outer-joined caller frame would otherwise inflate n). NULL
    ccf when either side is constant over the overlap (undefined)."""
    spark = series.sparkSession
    series = series.localCheckpoint(eager=False)
    lags = spark.range(-max_lag, max_lag + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = series.filter(
        F.col(day_col).isNotNull() & F.col(x_col).isNotNull()
    ).select(
        F.col(day_col).alias("__d"),
        F.col(x_col).cast("long").alias("__x"),
    )
    b = series.filter(
        F.col(day_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        F.col(day_col).alias("__d2"),
        F.col(y_col).cast("long").alias("__y"),
    )
    dec = lambda c: F.sum(c.cast("decimal(38,0)")).cast("double")
    decmul = lambda p, q: F.sum(p.cast("decimal(38,0)") * q).cast("double")
    pairs = a.crossJoin(F.broadcast(lags)).join(
        b, F.expr("date_add(__d, lag) = __d2")
    )
    g = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        dec(F.col("__x")).alias("__sx"),
        dec(F.col("__y")).alias("__sy"),
        decmul(F.col("__x"), F.col("__y")).alias("__sxy"),
        decmul(F.col("__x"), F.col("__x")).alias("__sxx"),
        decmul(F.col("__y"), F.col("__y")).alias("__syy"),
    )
    n = F.col("n_days").cast("double")
    vx = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    vy = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    num = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    return g.select(
        "lag",
        "n_days",
        F.when((vx > 0) & (vy > 0), F.round(num / F.sqrt(vx * vy), 6)).alias(
            "ccf"
        ),
    )


def haar_energy(
    series: DataFrame,
    day_col: str,
    value_col: str,
    levels: int = 4,
) -> DataFrame:
    """Haar wavelet detail-energy spectrum of a daily integer series
    (Haar 1910; Mallat, "A Theory for Multiresolution Signal
    Decomposition", IEEE PAMI 1989): at level j the detail coefficient
    of block p is D = (sum of the first half of the 2^j-day block) −
    (sum of the second half), and the level's energy is Σ_p D²/2^j
    (the orthonormal-Haar normalization). The SCALE-resolved variance
    decomposition events_acf can't give: energy concentrated at level
    3 (8-day blocks) says week-ish structure; a flat spectrum says
    noise — which rollup grain carries the signal.

    NO iterative halving: level-j block sums are grouped DIRECTLY from
    the (day, value) frame by i div 2^j with sign (i div 2^{j−1}) mod 2
    (one groupBy per level off the PINNED calendar-bounded frame,
    fanned by a broadcast level spine — the plan stays linear in
    ``levels`` and the caller's possibly corpus-scale lineage is not
    re-embedded per branch; the raking_ipf lesson applied at design
    time). Missing days count as 0, exactly as the dyadic transform of
    the gap-filled series: ``n_blocks`` is the dyadic block count over
    the FULL [0, max_i] span (an interior gap covering a whole block
    contributes an all-zero block — counted, energy 0), not merely the
    blocks that happen to contain data. Block sums stay integer; D²
    folds as 9-dp-rounded DECIMAL(38,9)."""
    series = series.localCheckpoint(eager=False)
    bounds = series.agg(
        F.min(day_col).alias("__d0"), F.max(day_col).alias("__d1")
    )
    lv = series.sparkSession.range(1, levels + 1).select(
        F.col("id").cast("int").alias("level")
    )
    base = series.crossJoin(F.broadcast(bounds)).select(
        F.datediff(F.col(day_col), F.col("__d0")).cast("long").alias("__i"),
        F.datediff(F.col("__d1"), F.col("__d0")).cast("long").alias("__imax"),
        F.col(value_col).cast("long").alias("__v"),
    )
    ex = base.crossJoin(F.broadcast(lv)).select(
        "level",
        "__imax",
        F.expr("__i DIV SHIFTLEFT(1L, level)").alias("__p"),
        F.expr(
            "CASE WHEN (__i DIV SHIFTLEFT(1L, level - 1)) % 2 = 0"
            " THEN __v ELSE -__v END"
        ).alias("__sv"),
    )
    d = ex.groupBy("level", "__p").agg(
        F.sum("__sv").alias("__dd"), F.max("__imax").alias("__imax")
    )
    dsum = lambda c: F.sum(F.round(c, 9).cast("decimal(38,9)")).cast("double")
    dd = F.col("__dd").cast("double")
    return (
        d.groupBy("level")
        .agg(
            F.expr("MAX(__imax) DIV SHIFTLEFT(1L, level) + 1")
            .cast("bigint")
            .alias("n_blocks"),
            dsum(
                dd * dd / F.expr("CAST(SHIFTLEFT(1L, level) AS DOUBLE)")
            ).alias("__e"),
        )
        .select("level", "n_blocks", F.round(F.col("__e"), 6).alias("energy"))
    )


def ljung_box(
    series: DataFrame,
    day_col: str = "day",
    value_col: str = "x",
    max_lag: int = 7,
) -> DataFrame:
    """Ljung–Box portmanteau test (Ljung & Box, "On a measure of lack of
    fit in time series models", Biometrika 1978): Q = n(n+2)·Σ_{k=1..L}
    r_k²/(n−k) over the first ``max_lag`` sample autocorrelations — the
    one-number "is this series white noise?" gate. Where a single acf
    spike flags one cycle, Q prices ALL short-range structure at once:
    the standard residual diagnostic before trusting a forecast
    (events_holt / events_ewma_trend) and the whiteness complement of
    events_cross_correlation's lag scan.

    Rides ``autocorrelation`` (same module): the lag pairs come from an
    equi-join on the calendar-bounded day frame, never a global window,
    and the Q fold runs over the ≤ ``max_lag``-row acf frame. Caller
    contract (inherited): a regular daily series — interior calendar
    gaps shrink the lag-k pair set, as in the sample acf. Engine-exact
    arithmetic: each acf is 6-dp-quantized (the ``autocorrelation``
    contract), each Q term r_k²/(n−k) is 9-dp-rounded and summed as
    DECIMAL(38,9), so both engines fold identical quantities.

    Returns one row (n, lags_used, df, q_stat); q_stat is NULL when no
    lag has a defined acf (constant series) or n ≤ 1."""
    n1 = series.agg(F.count(F.lit(1)).alias("__n"))
    acf = autocorrelation(series, day_col, value_col, max_lag)
    dsum = lambda c: F.sum(F.round(c, 9).cast("decimal(38,9)")).cast("double")
    terms = acf.crossJoin(F.broadcast(n1)).filter(
        F.col("acf").isNotNull() & (F.col("lag") < F.col("__n"))
    )
    agg = terms.agg(
        F.count(F.lit(1)).alias("__l"),
        dsum(
            F.col("acf") * F.col("acf")
            / (F.col("__n") - F.col("lag")).cast("double")
        ).alias("__s"),
    ).crossJoin(F.broadcast(n1))  # n reports even when no acf is defined
    nD = F.col("__n").cast("double")
    return agg.select(
        F.col("__n").cast("bigint").alias("n"),
        F.col("__l").cast("bigint").alias("lags_used"),
        F.col("__l").cast("bigint").alias("df"),
        F.when(
            (F.col("__l") > 0) & (F.col("__n") > 1),
            F.round(nD * (nD + 2.0) * F.col("__s"), 6),
        ).alias("q_stat"),
    )


def runs_test(
    series: DataFrame, day_col: str = "day", value_col: str = "x"
) -> DataFrame:
    """Wald–Wolfowitz runs test for randomness about the median (Wald &
    Wolfowitz, "On a test whether two samples are from the same
    population", AoMS 1940; the one-sample runs-about-the-median form):
    classify each point above/below the median, count the runs R of
    consecutive same-sign points in time order, and compare against the
    exact null moments μ = 2·n₁·n₂/n + 1 and σ² = 2·n₁·n₂(2·n₁·n₂ − n) /
    (n²(n−1)). Too FEW runs = clustering/trend; too MANY = oscillation —
    the sign-pattern complement of mann_kendall (which sees only
    monotone drift, not regime clustering or alternation).

    Deterministic median: the LOWER median — the value at ascending rank
    ⌈n/2⌉ = (n+1) div 2 — so both engines pick the identical element
    with no interpolation convention in play; points EQUAL to the median
    are excluded (the standard convention that keeps the ± classification
    unambiguous). All windows run over the calendar-bounded series frame
    (documented single-partition moment, kilobytes at any corpus scale);
    every count is exact integer, and z's float ops happen in one fixed
    order. Returns one row (n_pos, n_neg, runs, z_score); z is NULL when
    either sign class is empty (σ² = 0 — the statistic is undefined)."""
    pts = series.select(
        F.col(day_col).alias("__d"), F.col(value_col).cast("double").alias("__x")
    )
    ranked = pts.select(
        "__x", F.row_number().over(Window.orderBy("__x", "__d")).alias("__r")
    )
    n_med = ranked.agg(F.count(F.lit(1)).alias("__n")).select(
        "__n", ((F.col("__n") + 1) / 2).cast("long").alias("__mr")
    )
    med = (
        ranked.crossJoin(F.broadcast(n_med))
        .filter(F.col("__r") == F.col("__mr"))
        .select(F.col("__x").alias("__med"))
    )
    signed = (
        pts.crossJoin(F.broadcast(med))
        .filter(F.col("__x") != F.col("__med"))
        .select("__d", (F.col("__x") > F.col("__med")).alias("__s"))
    )
    w = Window.orderBy("__d")
    flips = signed.select(
        "__s",
        F.when(
            F.lag("__s").over(w).isNull()
            | (F.col("__s") != F.lag("__s").over(w)),
            1,
        )
        .otherwise(0)
        .alias("__new_run"),
    )
    agg = flips.agg(
        F.sum(F.col("__s").cast("long")).alias("__n1"),
        F.sum(F.lit(1) - F.col("__s").cast("long")).alias("__n2"),
        F.sum("__new_run").alias("__r"),
    )
    n1 = F.col("__n1").cast("double")
    n2 = F.col("__n2").cast("double")
    nn = n1 + n2
    two = 2.0 * n1 * n2
    mu = two / nn + 1.0
    var = two * (two - nn) / (nn * nn * (nn - 1.0))
    return agg.select(
        # a constant series leaves nothing after the median exclusion —
        # report zero counts, not NULLs
        F.coalesce(F.col("__n1"), F.lit(0)).cast("bigint").alias("n_pos"),
        F.coalesce(F.col("__n2"), F.lit(0)).cast("bigint").alias("n_neg"),
        F.coalesce(F.col("__r"), F.lit(0)).cast("bigint").alias("runs"),
        F.when(
            (F.col("__n1") > 0) & (F.col("__n2") > 0) & (var > 0),
            F.round((F.col("__r").cast("double") - mu) / F.sqrt(var), 6),
        ).alias("z_score"),
    )


def hurst_rs(
    series: DataFrame,
    day_col: str = "t",
    value_col: str = "x",
    min_scale: int = 8,
    n_scales: int = 4,
) -> DataFrame:
    """Hurst exponent by rescaled-range (R/S) analysis (Hurst, "Long-term
    storage capacity of reservoirs", Trans. ASCE 1951; Mandelbrot &
    Wallis 1969): at each block size s ∈ {min_scale·2^j}, split the
    observation sequence into full blocks, compute per block the range R
    of cumulative mean-deviations and the population std S, and fit
    H = slope of ln(avg R/S) on ln(s). H ≈ 0.5 is memoryless; H > 0.5
    long-range persistent (load waves); H < 0.5 anti-persistent — the
    long-memory diagnostic that ljung_box's short-lag Q cannot see.

    Scale shape: the sequence index is a row_number over the
    calendar-bounded series frame (documented single-partition moment);
    blocks are integer arithmetic on that index, fanned by a broadcast
    scale spine off the PINNED series (one groupBy per scale, the
    haar_energy geometry). Per-block folds run in fixed time order
    inside window frames; per-scale means 9-dp-round each block's R/S
    and sum as DECIMAL(38,9); the final OLS folds over ≤ ``n_scales``
    rows. Scales keeping fewer than 2 full blocks are dropped (rule
    mirrored by the oracle). Returns one row (n, scales_used,
    hurst_exponent); NULL H when fewer than 2 scales survive (no line
    to fit)."""
    pinned = series.select(
        F.col(day_col).alias("__d"), F.col(value_col).cast("double").alias("__x")
    ).localCheckpoint(eager=False)
    idx = pinned.select(
        "__x", (F.row_number().over(Window.orderBy("__d")) - 1).alias("__i")
    )
    nrow = idx.agg(F.count(F.lit(1)).alias("__n"))
    scales = (
        series.sparkSession.range(0, n_scales)
        .select(
            F.expr(
                f"CAST({int(min_scale)}L * shiftleft(1L, CAST(id AS INT)) "
                "AS BIGINT)"
            ).alias("__s")
        )
        .crossJoin(F.broadcast(nrow))
        .filter(F.expr("__n DIV __s >= 2"))
        .select("__s", "__n")
    )
    blocks = idx.crossJoin(F.broadcast(scales)).filter(
        F.expr("__i DIV __s < __n DIV __s")  # full blocks only
    ).select("__s", F.expr("__i DIV __s").alias("__b"), "__i", "__x")
    wB = Window.partitionBy("__s", "__b")
    wC = wB.orderBy("__i").rowsBetween(Window.unboundedPreceding, 0)
    withm = blocks.select(
        "__s", "__b", "__i", "__x", F.avg("__x").over(wB).alias("__m")
    )
    cum = withm.select(
        "__s",
        "__b",
        (F.col("__x") - F.col("__m")).alias("__dev"),
        F.sum(F.col("__x") - F.col("__m")).over(wC).alias("__c"),
    )
    dsum = lambda c: F.sum(F.round(c, 9).cast("decimal(38,9)")).cast("double")
    per_block = cum.groupBy("__s", "__b").agg(
        (F.max("__c") - F.min("__c")).alias("__rng"),
        # 9-dp-quantized dev² terms summed as decimal, mirroring the
        # oracle exactly: a raw-double fold here computes a DIFFERENT
        # quantity (dev² of a count series is an exact multiple of 1/s²,
        # 10+ decimal digits at s >= 32) and diverges on rounding knife
        # edges even though the fixture happens to agree at 6 dp
        F.sqrt(
            dsum(F.col("__dev") * F.col("__dev")) / F.count(F.lit(1))
        ).alias("__sd"),
    )
    per_scale = (
        per_block.filter(F.col("__sd") > 0)
        .groupBy("__s")
        .agg(
            dsum(F.col("__rng") / F.col("__sd")).alias("__rs_sum"),
            F.count(F.lit(1)).alias("__nb"),
        )
        .select(
            F.log(F.col("__s").cast("double")).alias("__lx"),
            F.log(
                F.round(F.col("__rs_sum") / F.col("__nb"), 9)
            ).alias("__ly"),
        )
    )
    fit = per_scale.agg(
        F.count(F.lit(1)).alias("__k"),
        dsum(F.col("__lx")).alias("__sx"),
        dsum(F.col("__ly")).alias("__sy"),
        dsum(F.col("__lx") * F.col("__ly")).alias("__sxy"),
        dsum(F.col("__lx") * F.col("__lx")).alias("__sxx"),
    )
    kD = F.col("__k").cast("double")
    denom = kD * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    return fit.crossJoin(F.broadcast(nrow)).select(
        F.col("__n").cast("bigint").alias("n"),
        F.col("__k").cast("bigint").alias("scales_used"),
        F.when(
            (F.col("__k") >= 2) & (denom != 0),
            F.round(
                (kD * F.col("__sxy") - F.col("__sx") * F.col("__sy")) / denom,
                6,
            ),
        ).alias("hurst_exponent"),
    )


def permutation_entropy(
    series: DataFrame, day_col: str = "day", value_col: str = "x"
) -> DataFrame:
    """Permutation entropy at embedding dimension 3 (Bandt & Pompe,
    "Permutation entropy: a natural complexity measure for time series",
    PRL 2002): slide a 3-point window over the observation sequence, map
    each triple to its ordinal pattern (the permutation that sorts it),
    and take the Shannon entropy of the pattern distribution, normalized
    by ln(3!) to [0, 1]. ≈1 is pattern-white; well below 1 means the
    series repeats local shapes — a complexity gate that is invariant to
    monotone rescaling of the values (mann_kendall sees drift,
    runs_test sees sign clustering; this sees SHAPE regularity).

    Ties follow the Bandt–Pompe convention: equal values rank by order
    of appearance (earlier index = lower rank), so every triple maps to
    exactly one of the 6 patterns deterministically — the rank of
    element i is #(x_j < x_i) + #(x_j = x_i, j < i), a closed-form CASE
    expression both engines evaluate identically. The embedding runs
    over consecutive OBSERVATIONS of the day-ordered series (gap-fill
    first if calendar adjacency matters); windows run over the
    calendar-bounded frame. The entropy folds over the ≤ 6-row pattern
    histogram with 9-dp-rounded DECIMAL(38,9) terms. Returns one row
    (n_windows, n_patterns, perm_entropy, perm_entropy_norm); NULL
    entropies when no window exists (series shorter than 3)."""
    w = Window.orderBy(day_col)
    tri = series.select(
        F.col(value_col).cast("double").alias("__a"),
        F.lead(value_col, 1).over(w).cast("double").alias("__b"),
        F.lead(value_col, 2).over(w).cast("double").alias("__c"),
    ).filter(F.col("__b").isNotNull() & F.col("__c").isNotNull())
    a, b, c = F.col("__a"), F.col("__b"), F.col("__c")
    # rank_i = #(x_j < x_i) + #(x_j = x_i and j < i); ranks are a
    # permutation of {0,1,2}; the pattern id concatenates them
    ra = (b < a).cast("int") + (c < a).cast("int")
    rb = (a <= b).cast("int") + (c < b).cast("int")
    rc = (a <= c).cast("int") + (b <= c).cast("int")
    hist = tri.select(
        (ra * 100 + rb * 10 + rc).alias("pattern")
    ).groupBy("pattern").agg(F.count(F.lit(1)).alias("__c"))
    dsum = lambda x: F.sum(F.round(x, 9).cast("decimal(38,9)")).cast("double")
    tot = hist.agg(F.sum("__c").alias("__n"))
    agg = hist.crossJoin(F.broadcast(tot)).agg(
        F.max("__n").alias("__n"),
        F.count(F.lit(1)).alias("__k"),
        dsum(
            -(F.col("__c") / F.col("__n"))
            * F.log(F.col("__c") / F.col("__n"))
        ).alias("__h"),
    )
    return agg.select(
        F.coalesce(F.col("__n"), F.lit(0)).cast("bigint").alias("n_windows"),
        F.coalesce(F.col("__k"), F.lit(0)).cast("bigint").alias("n_patterns"),
        F.when(F.col("__n") > 0, F.round(F.col("__h"), 6)).alias(
            "perm_entropy"
        ),
        F.when(
            F.col("__n") > 0,
            F.round(F.col("__h") / F.log(F.lit(6.0)), 6),
        ).alias("perm_entropy_norm"),
    )


def aov_periodogram(
    series: DataFrame,
    day_col: str = "day",
    value_col: str = "x",
    min_period: int = 2,
    max_period: int = 10,
) -> DataFrame:
    """Phase-folding (analysis-of-variance) periodogram (Stellingwerf,
    "Period determination using phase dispersion minimization", ApJ 1978;
    Schwarzenberg-Czerny, "On the advantage of using analysis of variance
    for period search", MNRAS 1989): for every candidate period p, fold
    the series on phase = calendar_index mod p and score how much of the
    total variance the p phase-bin means explain —
    ``eta2(p) = SS_between / SS_total`` plus the one-way-ANOVA
    ``F = (SS_b/(k−1)) / ((SS_t−SS_b)/(n−k))``. A peak at p = 7 is the
    weekly cycle. This is the FREQUENCY-DOMAIN detector the
    autocorrelation family (acf / ljung_box / hurst) prices only
    indirectly — and, unlike a trig periodogram, it is FFT-free and
    libm-free: every moment is an exact integer fold (the reason this
    variant was chosen over Schuster 1898 — no cross-engine cos/sin ulp
    class to manage), the textbook method for UNEVENLY sampled series,
    so calendar gaps need no gap-fill (phases keep calendar alignment
    via the datediff index; a missing day is simply an unobserved
    sample, exactly Stellingwerf's setting).

    Scale shape: the (day, value) frame is calendar-bounded and PINNED
    (``localCheckpoint``) so the corpus reduction is not re-embedded
    across the bounds/moments/phase branches; the period spine
    (max_period − min_period + 1 rows) and the 1-row bounds/moments
    aggregates are broadcast; the only shuffle is the
    (period × phase)-key aggregate over days × periods rows — bounded
    by the calendar, never by table size. Per-phase terms S²/n fold as
    9-dp-rounded DECIMAL(38,9) (the dsum idiom) so both engines sum
    identical quantities; sums and squared sums are DECIMAL(38,0)-exact
    (cast BEFORE multiply — a long·long x² overflows int64 at daily
    counts ≥ ~3e9). NULL eta2/F on a constant series (SS_total = 0);
    NULL F when a period leaves no within-phase degrees of freedom."""
    series = series.filter(
        F.col(day_col).isNotNull() & F.col(value_col).isNotNull()
    ).localCheckpoint(eager=False)
    spark = series.sparkSession
    bounds = series.agg(F.min(day_col).alias("__d0"))
    # calendar index: datediff for DATE axes, plain difference for
    # already-integer axes (both keep gap positions, unlike row_number)
    if dict(series.dtypes).get(day_col) == "date":
        idx = F.datediff(F.col(day_col), F.col("__d0"))
    else:
        idx = F.col(day_col) - F.col("__d0")
    base = series.crossJoin(F.broadcast(bounds)).select(
        idx.cast("long").alias("__i"),
        F.col(value_col).cast("long").alias("__v"),
    )
    dec = lambda c: F.sum(c.cast("decimal(38,0)"))
    v = F.col("__v")
    tot = base.agg(
        F.count(F.lit(1)).alias("__n"),
        dec(v).cast("double").alias("__s"),
        F.sum(v.cast("decimal(38,0)") * v).cast("double").alias("__ss"),
    )
    periods = spark.range(min_period, max_period + 1).select(
        F.col("id").cast("int").alias("period")
    )
    ph = (
        base.crossJoin(F.broadcast(periods))
        .groupBy("period", (F.col("__i") % F.col("period")).alias("__ph"))
        .agg(
            F.count(F.lit(1)).alias("__np"),
            dec(v).cast("double").alias("__sp"),
        )
    )
    dsum = lambda c: F.sum(F.round(c, 9).cast("decimal(38,9)")).cast("double")
    per = ph.groupBy("period").agg(
        F.count(F.lit(1)).alias("__k"),
        dsum(F.col("__sp") * F.col("__sp") / F.col("__np")).alias("__bsum"),
    )
    j = per.crossJoin(F.broadcast(tot))
    nD = F.col("__n").cast("double")
    kD = F.col("__k").cast("double")
    ss_t = F.col("__ss") - F.col("__s") * F.col("__s") / nD
    ss_b = F.col("__bsum") - F.col("__s") * F.col("__s") / nD
    return j.select(
        "period",
        F.col("__k").cast("bigint").alias("n_phases"),
        F.col("__n").cast("bigint").alias("n_days"),
        (F.when(ss_t > 0, F.round(ss_b / ss_t, 6)) + F.lit(0.0)).alias(
            "eta2"
        ),
        (
            F.when(
                (ss_t > 0)
                & (ss_t - ss_b > 0)
                & (F.col("__k") > 1)
                & (F.col("__n") > F.col("__k")),
                F.round(
                    (ss_b / (kD - 1)) / ((ss_t - ss_b) / (nD - kD)), 6
                ),
            )
            + F.lit(0.0)
        ).alias("f_stat"),
    )


def cusum_changepoint(
    series: DataFrame, day_col: str = "day", value_col: str = "x"
) -> DataFrame:
    """CUSUM change-point detection for a shift in mean (Page,
    "Continuous inspection schemes", Biometrika 1954; bridge
    normalization per Csörgő & Horváth, "Limit Theorems in Change-Point
    Analysis", 1997 §2.1): with prefix sums S_t over the day-ordered
    series, the tied-down bridge B_t = S_t − (t/n)·S_n peaks at the
    change point; the test statistic max_t |B_t| / (σ̂·√n) has the
    Kolmogorov distribution under H0 (values ≳ 1.36 reject at 5%).
    Returns the argmax day (earliest day on ties), the statistic, and
    the mean levels on each side of the split — the one-row "did the
    pipeline's arrival level SHIFT, and when?" gate that the monotone
    drift (mann_kendall) and whiteness (ljung_box, runs) tests do not
    answer.

    Scale shape: one corpus pass to the calendar-bounded day frame
    (PINNED); the prefix sum and row index are windows over that
    bounded frame; totals are a broadcast 1-row aggregate. The bridge
    is kept in EXACT integer space — n·S_t − t·S_n as DECIMAL(38,0)
    (cast before multiply) — so the argmax and its tie-break compare
    exact integers, never rounded floats; σ̂ folds from the same exact
    moments and the statistic max|bridge| / sqrt(n·(n·ΣX² − S²)) is a
    single fixed-order double expression. The argmax row travels
    through ``orderBy().limit(1)`` (TakeOrderedAndProject — distributed
    top-1, no global window). NULL statistic on a constant series
    (σ̂ = 0); NULL mean_after when the argmax is the last day."""
    series = series.filter(
        F.col(day_col).isNotNull() & F.col(value_col).isNotNull()
    ).localCheckpoint(eager=False)
    v = F.col(value_col).cast("long")
    wS = Window.orderBy(day_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wT = Window.orderBy(day_col)
    pre = series.select(
        F.col(day_col).alias("__d"),
        F.row_number().over(wT).cast("long").alias("__t"),
        F.sum(v.cast("decimal(38,0)")).over(wS).alias("__st"),
    )
    tot = series.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(v.cast("decimal(38,0)")).alias("__s"),
        F.sum(v.cast("decimal(38,0)") * v).alias("__ss"),
    )
    j = pre.crossJoin(F.broadcast(tot))
    bridge = F.col("__n").cast("decimal(38,0)") * F.col("__st") - F.col(
        "__t"
    ).cast("decimal(38,0)") * F.col("__s")
    top = (
        j.select(
            "__d", "__t", "__st", "__n", "__s", "__ss",
            F.abs(bridge).alias("__ab"),
        )
        .orderBy(F.col("__ab").desc(), F.col("__d").asc())
        .limit(1)
    )
    nD = F.col("__n").cast("double")
    var_num = (
        F.col("__n").cast("decimal(38,0)") * F.col("__ss")
        - F.col("__s") * F.col("__s")
    ).cast("double")
    tD = F.col("__t").cast("double")
    stD = F.col("__st").cast("double")
    sD = F.col("__s").cast("double")
    return top.select(
        F.col("__n").cast("bigint").alias("n_days"),
        F.col("__d").alias("change_day"),
        F.col("__t").cast("bigint").alias("change_index"),
        F.when(
            var_num > 0,
            F.round(
                F.col("__ab").cast("double") / F.sqrt(nD * var_num), 6
            ),
        ).alias("cusum_stat"),
        F.round(stD / tD, 6).alias("mean_before"),
        F.when(
            F.col("__n") > F.col("__t"),
            F.round((sD - stD) / (nD - tD), 6),
        ).alias("mean_after"),
    )


def pettitt_changepoint(
    series: DataFrame, day_col: str = "day", value_col: str = "x"
) -> DataFrame:
    """Pettitt's nonparametric change-point test (Pettitt, "A
    non-parametric approach to the change-point problem", JRSS-C 1979)
    on a day-grain series — the RANK-BASED twin of the CUSUM bridge
    (``cusum_changepoint``): where the bridge locates a shift in the
    MEAN and is level-sensitive, Pettitt's statistic

        U_t = sum_{i<=t} sum_{j>t} sgn(x_i - x_j)

    is a Mann-Whitney-style rank comparison of the two sides of every
    candidate split, so it locates a shift in DISTRIBUTION position
    while being immune to outlier magnitude (one enormous day moves the
    bridge arbitrarily; it moves each sgn() by at most 1).  The
    change-point estimate is argmax_t |U_t| over t = 1..n-1 (earliest
    day on ties), K = max|U_t| is the test statistic, and the
    approximate significance is p ~ 2·exp(-6K²/(n³+n²)) (Pettitt 1979,
    eq. 12); the operator reports the EXPONENT 6K²/(n³+n²) rather than
    applying exp() — exact integer moments with one final division, no
    libm and no cross-engine ulp class (the aov_periodogram design
    rule); callers apply exp() offline.

    Scale shape: one corpus pass to the calendar-bounded day frame
    (PINNED upstream, the mann_kendall/hodges_lehmann contract); V_t =
    sum_j sgn(x_t - x_j) is the D×D bounded pair join over that frame
    (D = distinct days, quadratic in DAYS, never events); the standard
    identity U_t = U_{t-1} + V_t turns the double sum into one prefix
    window over the D-row V frame; the argmax travels through
    ``orderBy().limit(1)`` (TakeOrderedAndProject, no global funnel).
    Every U_t is an exact integer (a sum of -1/0/+1 terms), so the
    argmax and tie-break compare exact integers.  Returns one row
    (n_days, change_day, change_index, k_stat, u_signed,
    p_exponent)."""
    base = series.filter(
        F.col(day_col).isNotNull() & F.col(value_col).isNotNull()
    ).localCheckpoint(eager=False)
    wT = Window.orderBy(day_col)
    idx = base.select(
        F.col(day_col).alias("__d"),
        F.row_number().over(wT).cast("long").alias("__t"),
        F.col(value_col).alias("__x"),
    ).localCheckpoint(eager=False)
    a, b = idx.alias("a"), idx.alias("b")
    sgn = (
        F.when(F.col("a.__x") > F.col("b.__x"), F.lit(1))
        .when(F.col("a.__x") < F.col("b.__x"), F.lit(-1))
        .otherwise(F.lit(0))
    )
    v = (
        a.crossJoin(b)
        .groupBy(F.col("a.__d").alias("__d"), F.col("a.__t").alias("__t"))
        .agg(F.sum(sgn).cast("long").alias("__v"))
    )
    wU = Window.orderBy("__t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    u = v.select(
        "__d", "__t", F.sum("__v").over(wU).cast("long").alias("__u")
    )
    n_tot = base.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    top = (
        u.crossJoin(F.broadcast(n_tot))
        .filter(F.col("__t") < F.col("__n"))
        .orderBy(F.abs(F.col("__u")).desc(), F.col("__d").asc())
        .limit(1)
    )
    nD = F.col("__n").cast("double")
    kD = F.abs(F.col("__u")).cast("double")
    return top.select(
        F.col("__n").cast("bigint").alias("n_days"),
        F.col("__d").alias("change_day"),
        F.col("__t").cast("bigint").alias("change_index"),
        F.abs(F.col("__u")).cast("bigint").alias("k_stat"),
        F.col("__u").cast("bigint").alias("u_signed"),
        F.round(
            F.lit(6.0) * kD * kD / (nD * nD * nD + nD * nD), 6
        ).alias("p_exponent"),
    )
