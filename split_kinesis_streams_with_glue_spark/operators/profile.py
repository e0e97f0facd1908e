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


def exact_quantile_twopass(
    df: DataFrame,
    col: str,
    q: float,
    n_bins: int = 1024,
    rank_limit: int = 1_000_000,
) -> DataFrame:
    """EXACT quantile (type-1 / lower order statistic: the k-th smallest
    with k = ceil(q*n)) without a global sort — the at-scale exact path
    between `percentile` (full sort-based) and `approx_percentile`
    (error-bounded sketch).

    Iterative bin refinement: each pass histograms the surviving
    candidate range into ``n_bins`` equi-width bins over its CURRENT
    [min, max] and narrows to the bin containing the k-th value (rank
    bookkeeping from the bounded cumulative bin frame — n_bins rows,
    never data rows). Candidates shrink ~n_bins× per pass, so the final
    single-partition ranking only ever sees ≤ ``rank_limit`` rows (two
    passes cover 10^12 rows at the default settings); a range whose
    values are all equal short-circuits (duplicate-heavy skew cannot
    loop forever). Every per-pass aggregate is metadata-sized.

    Returns one row: (quantile, value, n).
    """
    total = df.filter(F.col(col).isNotNull()).count()
    if total == 0:
        return df.sparkSession.createDataFrame(
            [], "quantile double, value double, n bigint"
        )
    kn = q * total
    k = max(1, int(kn) if kn == int(kn) else int(kn) + 1)
    value = _kth_smallest(df, col, k, n_bins, rank_limit)
    return df.sparkSession.createDataFrame(
        [(q, value, total)], "quantile double, value double, n bigint"
    )


def _kth_smallest(
    df: DataFrame,
    col: str,
    k: int,
    n_bins: int = 1024,
    rank_limit: int = 1_000_000,
) -> float:
    """The k-th smallest non-null value of ``col`` by the iterative
    bin-refinement of ``exact_quantile_twopass`` (its extracted core, so
    order-statistic consumers — e.g. the distribution-free median CI —
    can address a RANK directly instead of round-tripping through a
    float quantile whose q*n can land an ulp off the intended k)."""
    from pyspark.sql import Window

    cand = df.filter(F.col(col).isNotNull()).select(
        F.col(col).cast("double").alias("v")
    )
    for _ in range(6):
        agg = cand.agg(
            F.count(F.lit(1)).alias("c"), F.min("v").alias("mn"), F.max("v").alias("mx")
        ).collect()[0]  # 1-row metadata aggregate
        if agg["mn"] == agg["mx"]:
            return float(agg["mn"])
        if int(agg["c"]) <= rank_limit:
            break
        lo_, hi_ = float(agg["mn"]), float(agg["mx"])
        width = (hi_ - lo_) / n_bins
        b = F.least(
            F.lit(n_bins - 1), F.floor((F.col("v") - lo_) / width).cast("int")
        )
        hist = cand.select(b.alias("bin")).groupBy("bin").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
        located = (
            hist.withColumn("before", F.coalesce(F.sum("cnt").over(w), F.lit(0)))
            .filter((F.col("before") < k) & (F.col("before") + F.col("cnt") >= k))
            .collect()[0]
        )  # bounded: the n_bins-row frame
        tb, before = int(located["bin"]), int(located["before"])
        k -= before
        # narrow with the IDENTICAL binning expression the histogram used:
        # reconstructing [bin_lo, bin_hi) arithmetically can disagree with
        # floor((v - lo)/width) by an ulp at bin edges, stranding a value
        # the rank bookkeeping counted
        cand = cand.filter(b == tb)
    return float(
        cand.withColumn("r", F.row_number().over(Window.orderBy("v")))
        .filter(F.col("r") == k)
        .collect()[0]["v"]
    )


#: Poisson(1) cumulative distribution, P(X <= k) for k = 0..5 — the inverse-
#: CDF thresholds for hash-derived bootstrap weights (beyond 5: weight 6,
#: probability ~6e-5). Exact double literals, identical in the SQL oracle.
_POIS1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
)


def poisson_bootstrap_ci(
    df: DataFrame,
    key_col: str,
    value_col: str,
    b_reps: int = 100,
    alpha: float = 0.05,
    decimal_scale: int = 2,
) -> DataFrame:
    """Poisson-bootstrap confidence interval for SUM(value_col) — the
    at-scale bootstrap (Chamandy et al., "Estimating uncertainty for
    massive data streams", Google 2012): instead of materializing B
    resamples, each row contributes to every replicate with a weight
    drawn Poisson(1), so all B replicate sums accumulate in ONE pass with
    map-side combine; n ~ Poisson means the resample size is random, which
    converges to the classic bootstrap for large n.

    Weights are DERIVED, not random: ``u = md5(key:rep)`` as a uniform in
    [0,1) through the Poisson inverse CDF — deterministic across runs,
    engines, partitionings (the repo's standard hash-randomness idiom), so
    the whole CI is oracle-checkable. Replicate sums run in DECIMAL
    (exact); the percentile interpolation over the B-row frame is the
    only float step. Returns one row (point_sum, ci_lo, ci_hi, n_reps)."""
    from split_kinesis_streams_with_glue_spark.operators.sampling import _u32_frac

    vdec = F.col(value_col).cast(f"decimal(18,{decimal_scale})")
    reps = df.select(F.col(key_col), vdec.alias("__v")).withColumn(
        "__rep", F.explode(F.sequence(F.lit(0), F.lit(b_reps - 1)))
    )
    u = _u32_frac(
        F.concat(F.col(key_col).cast("string"), F.lit(":"), F.col("__rep").cast("string"))
    )
    k = F.lit(6)
    for i in range(len(_POIS1_CDF) - 1, -1, -1):
        k = F.when(u < F.lit(_POIS1_CDF[i]), i).otherwise(k)
    sums = (
        reps.select("__rep", (k * F.col("__v")).alias("__wv"))
        .groupBy("__rep")
        .agg(F.sum("__wv").cast("double").alias("__s"))
    )
    lo_q, hi_q = alpha / 2.0, 1.0 - alpha / 2.0
    # CIs round to 2 decimals (cents): the interpolation's double ULP at
    # billion-scale sums (~5e-7) sits right at a 6-decimal boundary
    ci = sums.agg(
        F.round(F.expr(f"percentile(__s, {lo_q!r})"), 2).alias("ci_lo"),
        F.round(F.expr(f"percentile(__s, {hi_q!r})"), 2).alias("ci_hi"),
        F.count(F.lit(1)).cast("bigint").alias("n_reps"),
    )
    point = df.agg(F.round(F.sum(vdec).cast("double"), 2).alias("point_sum"))
    return point.crossJoin(F.broadcast(ci)).select(
        "point_sum", "ci_lo", "ci_hi", "n_reps"
    )


def boxplot_stats(
    df: DataFrame, value_col: str, group_col: str
) -> DataFrame:
    """Per-group five-number summary with Tukey fences: quartiles (exact,
    linear interpolation), IQR, whisker positions (the most extreme
    values still inside 1.5·IQR), and the outlier count — the one-pass
    distribution card per language/source that a corpus dashboard draws
    directly, and the principled per-group outlier budget the MAD screen
    complements.

    Two passes: the quartile aggregate per group (exact ``percentile`` —
    a per-group sort, acceptable because the grouping is low-cardinality
    by contract; swap in ``exact_quantile_twopass`` per group when it
    isn't), then the fence scan with the bounded quartile frame broadcast
    back. Returns (group, n, q1, median, q3, iqr, lo_whisker,
    hi_whisker, n_outliers)."""
    v = F.col(value_col).cast("double")
    q = df.filter(v.isNotNull()).groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr(f"percentile({value_col}, 0.25)").alias("q1"),
        F.expr(f"percentile({value_col}, 0.5)").alias("median"),
        F.expr(f"percentile({value_col}, 0.75)").alias("q3"),
    )
    fences = q.select(
        group_col,
        "n",
        "q1",
        "median",
        "q3",
        (F.col("q3") - F.col("q1")).alias("iqr"),
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("__lo"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("__hi"),
    )
    scan = df.filter(v.isNotNull()).join(F.broadcast(fences), group_col)
    return (
        scan.groupBy(
            group_col, "n", "q1", "median", "q3", "iqr", "__lo", "__hi"
        )
        .agg(
            F.min(F.when(v >= F.col("__lo"), v)).alias("lo_whisker"),
            F.max(F.when(v <= F.col("__hi"), v)).alias("hi_whisker"),
            F.sum(
                F.when((v < F.col("__lo")) | (v > F.col("__hi")), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .select(
            group_col,
            "n",
            F.round("q1", 6).alias("q1"),
            F.round("median", 6).alias("median"),
            F.round("q3", 6).alias("q3"),
            F.round("iqr", 6).alias("iqr"),
            "lo_whisker",
            "hi_whisker",
            "n_outliers",
        )
    )


def median_ci(
    df: DataFrame, col: str, z: float = 1.96
) -> DataFrame:
    """Distribution-free confidence interval for the MEDIAN via order
    statistics (the binomial/normal-approximation rank bounds: l =
    floor((n − z·sqrt(n))/2), u = ceil(1 + (n + z·sqrt(n))/2), clamped to
    [1, n]) — the error bar every median in a report should carry, with
    NO distributional assumption (the bootstrap answers the same
    question for sums). The interval endpoints are exact order
    statistics fetched by RANK through the iterative bin-refinement
    (``_kth_smallest``), so no global sort happens at any n; three rank
    lookups total. Returns one row (n, median, ci_lo, ci_hi, rank_lo,
    rank_hi)."""
    import math

    total = df.filter(F.col(col).isNotNull()).count()
    if total == 0:
        return df.sparkSession.createDataFrame(
            [],
            "n bigint, median double, ci_lo double, ci_hi double, "
            "rank_lo bigint, rank_hi bigint",
        )
    half = z * math.sqrt(total)
    lo_k = max(1, int(math.floor((total - half) / 2)))
    hi_k = min(total, int(math.ceil(1 + (total + half) / 2)))
    med_k = (total + 1) // 2 if total % 2 == 1 else total // 2
    med = _kth_smallest(df, col, int(med_k))
    lo = _kth_smallest(df, col, lo_k)
    hi = _kth_smallest(df, col, hi_k)
    return df.sparkSession.createDataFrame(
        [(total, med, lo, hi, lo_k, hi_k)],
        "n bigint, median double, ci_lo double, ci_hi double, "
        "rank_lo bigint, rank_hi bigint",
    )


def key_skew_profile(df: DataFrame, key_col: str, top: int = 10) -> DataFrame:
    """Join/shuffle-key skew advisor: the diagnostic a user runs BEFORE a
    big join to decide between plain shuffle, AQE skew handling, and
    explicit salting. Collapses the table to the per-key frequency frame
    (one groupBy — the only data-sized shuffle), then folds one summary
    row: row/key counts, mean and max per-key frequency, the skew ratio
    max/mean (how many times its fair share the hottest key holds), the
    frequency mass of the ``top`` hottest keys (hot-SET concentration —
    one mild key is salvageable, ten are a repartition problem), and the
    recommended salt factor ceil(max/mean) — the replication count that
    levels the hottest key to an average-sized shuffle partition
    (SURVEY §2.5's salted-join pattern consumes exactly this number).

    The top-``top`` mass comes from a TakeOrderedAndProject over the
    per-key frame (k rows per partition, never a global sort) broadcast
    back onto the 1-row summary."""
    freq = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("__c"))
    summary = freq.agg(
        F.sum("__c").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.max("__c").cast("bigint").alias("max_per_key"),
    )
    top_mass = (
        freq.orderBy(F.col("__c").desc(), F.col(key_col))
        .limit(top)
        .agg(F.sum("__c").cast("bigint").alias("__top_mass"))
    )
    mean = F.col("n_rows").cast("double") / F.col("n_keys").cast("double")
    ratio = F.col("max_per_key").cast("double") / mean
    return summary.crossJoin(F.broadcast(top_mass)).select(
        "n_rows",
        "n_keys",
        "max_per_key",
        F.round(mean, 6).alias("mean_per_key"),
        F.round(ratio, 6).alias("skew_ratio"),
        F.round(
            F.col("__top_mass").cast("double") / F.col("n_rows").cast("double"),
            6,
        ).alias("top10_share"),
        F.ceil(ratio).cast("bigint").alias("salt_factor"),
    )


def weighted_quantile(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    q_num: int,
    q_den: int,
    n_bins: int = 1024,
    weight_limit: int = 1_000_000_000,
) -> float:
    """Exact weighted quantile at the rational ``q_num/q_den`` — the
    smallest value v with cumulative weight(x <= v) >= q*W. The
    weighted mirror of ``_kth_smallest``: once every document carries a
    loss weight (soft-dedup 1/cluster-size, DSIR importance, temperature
    mixes), the corpus' length/quality profile must be read through
    those weights — the EFFECTIVE median document is not the raw median
    document.

    ``weight_col`` must be exact INTEGER weights (pre-scale fractional
    weights to micro-units upstream): the target then reduces to an
    integer rank TT = ceil(q_num*W / q_den), every comparison is integer
    arithmetic, and the selected value is bit-identical in any engine —
    no float cumulative-sum boundary can flip it.

    Same at-scale shape as the rank machinery: iterative bin refinement
    while the candidate WEIGHT mass exceeds ``weight_limit`` (each round
    is one bounded histogram of weight sums + one metadata aggregate;
    never a global sort), then one cumulative window over the bounded
    survivor frame."""
    from pyspark.sql import Window

    cand = df.filter(
        F.col(value_col).isNotNull() & (F.col(weight_col) > 0)
    ).select(
        F.col(value_col).cast("double").alias("v"),
        F.col(weight_col).cast("bigint").alias("w"),
    )
    total = cand.agg(F.sum("w").alias("tw")).collect()[0]  # 1-row metadata
    tt = (q_num * int(total["tw"]) + q_den - 1) // q_den
    for _ in range(6):
        agg = cand.agg(
            F.sum("w").alias("tw"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        ).collect()[0]  # 1-row metadata aggregate
        if agg["mn"] == agg["mx"]:
            return float(agg["mn"])
        if int(agg["tw"]) <= weight_limit:
            break
        lo_, hi_ = float(agg["mn"]), float(agg["mx"])
        width = (hi_ - lo_) / n_bins
        b = F.least(
            F.lit(n_bins - 1), F.floor((F.col("v") - lo_) / width).cast("int")
        )
        hist = cand.select(b.alias("bin"), "w").groupBy("bin").agg(
            F.sum("w").alias("cnt")
        )
        w_ = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
        located = (
            hist.withColumn("before", F.coalesce(F.sum("cnt").over(w_), F.lit(0)))
            .filter((F.col("before") < tt) & (F.col("before") + F.col("cnt") >= tt))
            .collect()[0]
        )  # bounded: the n_bins-row frame
        tb, before = int(located["bin"]), int(located["before"])
        tt -= before
        # narrow with the IDENTICAL binning expression (ulp-at-edges care,
        # same as _kth_smallest)
        cand = cand.filter(b == tb)
    byv = cand.groupBy("v").agg(F.sum("w").alias("wv"))
    wc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    return float(
        byv.withColumn("cw", F.sum("wv").over(wc))
        .filter(F.col("cw") >= tt)
        .orderBy("v")
        .limit(1)
        .collect()[0]["v"]
    )


def pareto_skyline(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Pareto frontier (skyline) over two maximize-dimensions
    (Börzsönyi, Kossmann & Stocker, ICDE 2001): the rows no other row
    dominates, where b dominates a iff b ≥ a in both dimensions and
    b > a in at least one. The multi-objective selection primitive a
    curation pipeline needs when two quality signals trade off (length
    vs lexical diversity, quality vs novelty): every skyline row is an
    optimal trade, everything else is strictly improvable.

    Plan shape — NOT the textbook O(n²) anti-dominance self-join (the
    NOT EXISTS form is kept as the ORACLE): in 2-D, dominance folds
    into prefix maxima over the x-grouped frame. One groupBy collapses
    the data to (x, max-y-at-x); a cumulative window in descending x
    over THAT bounded frame yields pmax(x) = max y among strictly
    greater x; a row survives iff y > pmax(x) (or no greater x exists)
    AND y equals its own group's max. The corpus is scanned once and
    rejoined to the broadcast per-x threshold frame — skyline at the
    cost of a grouped aggregate, independent of the skyline's size.

    Caller contract: ``x_col`` must be bounded-cardinality (an integer
    measure like token count — the threshold frame is |distinct x|
    rows) and both columns NULL-free; equal points dominate neither
    each other nor themselves (classical strict-dominance semantics),
    so exact duplicates of a frontier point all survive.

    Returns the input columns, skyline rows only."""
    from pyspark.sql import Window

    g = df.groupBy(F.col(x_col).alias("__x")).agg(
        F.max(F.col(y_col)).alias("__gmax")
    )
    w = Window.orderBy(F.col("__x").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )  # bounded: one row per distinct x
    thr = g.select(
        "__x",
        "__gmax",
        F.max("__gmax").over(w).alias("__pmax"),
    )
    return (
        df.join(F.broadcast(thr), df[x_col] == F.col("__x"))
        .filter(
            (F.col("__pmax").isNull() | (F.col(y_col) > F.col("__pmax")))
            & (F.col(y_col) >= F.col("__gmax"))
        )
        .drop("__x", "__gmax", "__pmax")
    )
