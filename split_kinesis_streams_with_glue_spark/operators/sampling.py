"""Deterministic sampling / dataset-split operators for training-data
pipelines (SURVEY.md §2.6 X5 posture: stateless, keyless, no driver-side
randomness).

Splits are keyed on a CONTENT hash (``md5`` of the text), not on row ids or
``rand()``: the assignment survives re-ingestion, re-partitioning, and id
renumbering, and identical documents always land in the same split — the
property that prevents train/test leakage through duplicates. md5 emits
lowercase fixed-width hex in every engine, so threshold comparison works
lexicographically and the same rule is expressible in ANSI SQL for the
oracle (no engine-specific hash needed).

All operators are narrow (filter/project only): no shuffle, fully
pushdown-friendly, linear at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hex_bucket(col: Column) -> Column:
    """First 4 hex chars of md5 → lexicographic position in [0, 65536)."""
    return F.substring(F.md5(col), 1, 4)


def _hex_threshold(frac: float) -> str:
    """The threshold string h such that P(bucket < h) == round(frac*65536)/65536.

    Boundary care: ``frac >= 1.0`` must admit EVERY bucket, but
    ``format(65536, "04x")`` is the 5-char "10000", which compares lexically
    BELOW any bucket not starting with '0' — silently dropping ~94% of rows.
    "g" sorts after every hex digit, so ``bucket < "g"`` is a tautology (and
    is equally expressible in the ANSI-SQL oracle)."""
    n = max(0, min(65536, round(frac * 65536)))
    return "g" if n >= 65536 else format(n, "04x")


def hash_split(
    df: DataFrame,
    text_col: str = "text",
    train: float = 0.8,
    val: float = 0.1,
    split_col: str = "split",
) -> DataFrame:
    """Assign train/val/test by content hash: ``train`` fraction, then
    ``val``, remainder test. Pure projection — no shuffle, deterministic,
    duplicate-safe (equal text ⇒ equal split)."""
    b = _hex_bucket(F.col(text_col))
    t1, t2 = _hex_threshold(train), _hex_threshold(train + val)
    return df.withColumn(
        split_col,
        F.when(b < F.lit(t1), "train").when(b < F.lit(t2), "val").otherwise("test"),
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    label_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic per-class downsampling: keep a class-specific fraction
    of rows, chosen by the same content-hash bucket (so the kept set is
    stable across runs and engines). Classes absent from ``rates`` are
    dropped — the rebalancing shape used to cap over-represented languages
    or sources in a training mix. Pure filter: pushes down, no shuffle."""
    b = _hex_bucket(F.col(text_col))
    cond = None
    for label, rate in sorted(rates.items()):
        this = (F.col(label_col) == label) & (b < F.lit(_hex_threshold(rate)))
        cond = this if cond is None else cond | this
    return df.filter(cond)


def _u32_frac(col: Column) -> Column:
    """First 8 md5 hex chars as a uniform double in [0, 1) — finer-grained
    than the 4-char bucket, and expressible identically in ANSI SQL
    (``CAST('0x'||substr(md5(x),1,8) AS BIGINT) / 2^32``)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("double") / F.lit(
        4294967296.0
    )


def temperature_sample(
    df: DataFrame,
    group_col: str = "lang",
    alpha: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Temperature-based group rebalancing — the multilingual mixing rule
    (sampling ∝ p^alpha, as in multilingual pretraining corpora): with
    group shares p_g, the per-row keep rate is (c_min / c_g)^(1-alpha), so
    the rarest group keeps everything and common groups are downsampled
    toward a flatter distribution; alpha=1 keeps the natural mix, alpha=0
    equalizes expected counts.

    Rates are DATA-DEPENDENT but the plan stays two tiny aggregates (group
    counts, their min) broadcast back onto a content-hash filter — one
    linear scan of the corpus, no shuffle of data rows, deterministic
    across runs/engines/partitionings. Rates are rounded to 6 decimals so
    the same rule is bit-identical in the ANSI-SQL oracle."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__c"))
    cmin = counts.agg(F.min("__c").alias("__cmin"))
    rates = counts.crossJoin(F.broadcast(cmin)).select(
        group_col,
        F.round(
            F.pow(F.col("__cmin") / F.col("__c"), F.lit(1.0 - alpha)), 6
        ).alias("__rate"),
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(_u32_frac(F.col(text_col)) < F.col("__rate"))
        .drop("__rate")
    )


def dsir_scores(
    df: DataFrame,
    target: Column,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance scores: how much more likely a document is
    under the TARGET distribution than under the raw corpus, estimated
    with hashed-unigram bag-of-words models (the hashed n-gram importance
    weighting of Xie et al. 2023, unigram variant; bigrams drop in by
    hashing token pairs into the same buckets).

    ``target`` is a boolean Column over ``df`` (e.g. ``lang == 'en'`` or a
    quality-gate predicate) defining the in-domain subset. Per bucket b:
    ``llr[b] = ln p_target(b) - ln p_raw(b)`` with add-one smoothing; a
    document's score is the mean llr of its tokens — positive means
    "more target-like than the corpus average". Selection = filter on the
    score (deterministic) or compare against a content-hash uniform for
    stochastic-but-reproducible resampling (``_u32_frac``).

    Scale shape: the (doc, bucket) explode feeds three consumers (raw
    counts, target counts, scoring) — three LINEAR tokenize+hash passes,
    since caching a corpus-token-sized frame is worse than recomputing it;
    both frequency models are <= ``n_buckets``-row aggregates that
    BROADCAST back onto it (the model never shuffles the corpus); scoring
    is one grouped mean keyed by doc id. The md5-derived bucketing is
    engine-portable, so the whole pipeline is expressible in the ANSI-SQL
    oracle."""
    words = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("__w"),
    ).filter(F.col("__w") != "")
    bucket = (
        F.conv(F.substring(F.md5(F.col("__w")), 1, 8), 16, 10).cast("long")
        % n_buckets
    )
    feat = words.select(id_col, bucket.alias("__b"))
    tgt_ids = df.filter(target).select(id_col)
    raw = feat.groupBy("__b").agg(F.count(F.lit(1)).alias("__rc"))
    tgt = (
        feat.join(tgt_ids, id_col, "left_semi")
        .groupBy("__b")
        .agg(F.count(F.lit(1)).alias("__tc"))
    )
    rtot = raw.agg(F.sum("__rc").alias("__rtot"))
    ttot = tgt.agg(F.coalesce(F.sum("__tc"), F.lit(0)).alias("__ttot"))
    llr = (
        raw.join(tgt, "__b", "left")
        .crossJoin(F.broadcast(rtot))
        .crossJoin(F.broadcast(ttot))
        .select(
            "__b",
            (
                F.log(
                    (F.coalesce(F.col("__tc"), F.lit(0)) + 1.0)
                    / (F.col("__ttot") + n_buckets)
                )
                - F.log((F.col("__rc") + 1.0) / (F.col("__rtot") + n_buckets))
            ).alias("__llr"),
        )
    )
    return feat.join(F.broadcast(llr), "__b").groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.round(F.avg("__llr"), 6).alias("dsir_score"),
    )


def token_budget_sample(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Select a deterministic sub-corpus of ~``budget`` tokens: documents
    are ordered by content hash (stable across runs/engines, uncorrelated
    with ingest order — the same de-biasing trick as ``hash_split``) and
    kept while their EXCLUSIVE running token total is below the budget, so
    overshoot is at most one document. The shape every "train on exactly
    N tokens" ablation needs.

    The running total reuses ``packing.prefix_sums`` — the distributed
    two-phase prefix sum — so there is no single-task global window at any
    corpus size; output carries ``n_tokens`` and ``start_offset`` for
    downstream packing."""
    from split_kinesis_streams_with_glue_spark.functions.textfns import TOKEN_PATTERN
    from split_kinesis_streams_with_glue_spark.operators.packing import prefix_sums

    withtok = df.withColumn(
        "n_tokens",
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_PATTERN), 0)).cast(
            "long"
        ),
    ).withColumn(
        # unique order key: content hash, id tie-break (duplicate texts)
        "__ord",
        F.concat(F.md5(F.col(text_col)), F.lit("-"), F.col(id_col).cast("string")),
    )
    return (
        prefix_sums(withtok, "n_tokens", "__ord")
        .filter(F.col("start_offset") < budget)
        .drop("__ord")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    expected_n: float,
    text_col: str = "text",
) -> DataFrame:
    """Probability-proportional-to-size sampling: keep each row with
    inclusion probability ``expected_n * w_i / W`` (W = total weight), so
    the expected sample size is ``expected_n`` and heavy rows (long docs,
    high-quality docs) are proportionally favored — the standard one-pass
    weighted downsampling of a training mix.

    Determinism is the whole design: the uniform draw is 48 bits of the
    CONTENT md5 (duplicate-safe, engine-portable), and the keep rule is the
    multiplication-only comparison ``u * W < expected_n * w * 2^48`` —
    no ln/pow/rand, whose last-ulp behavior differs between engines, and no
    division, so the identical expression hashes identically in the SQL
    oracle. Rows with w_i >= W/expected_n are kept with certainty (their
    inclusion probability caps at 1 — the usual PPS cap). One tiny total
    agg broadcast back; otherwise a pure filter: pushes down, no shuffle."""
    total = df.agg(F.sum(F.col(weight_col)).cast("double").alias("__W"))
    u48 = F.conv(F.substring(F.md5(F.col(text_col)), 1, 12), 16, 10).cast("bigint")
    keep = (u48.cast("double") * F.col("__W")) < (
        F.lit(float(expected_n)) * F.col(weight_col).cast("double") * F.lit(float(1 << 48))
    )
    return df.crossJoin(F.broadcast(total)).filter(keep).drop("__W")


def cluster_safe_split(
    df: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    train: float = 0.8,
    val: float = 0.1,
    split_col: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: near-duplicate documents
    must land in the SAME split, or the model is evaluated on paraphrases
    of its training data. ``hash_split`` already pins exact duplicates
    (same text => same hash); this closes the near-dup hole by keying the
    split on the document's duplicate-CLUSTER id (connected components
    over the near-dup pair graph) instead of its own content — every
    member of a cluster inherits one assignment. Cost: the components
    iteration over the pair graph (already computed for dedup); the split
    itself stays a pure projection."""
    from split_kinesis_streams_with_glue_spark.operators.graph import cluster_labels

    labeled = cluster_labels(df, edges, id_col)
    b = _hex_bucket(F.col("cluster_id").cast("string"))
    t1, t2 = _hex_threshold(train), _hex_threshold(train + val)
    return labeled.withColumn(
        split_col,
        F.when(b < F.lit(t1), "train").when(b < F.lit(t2), "val").otherwise("test"),
    )


def neyman_allocation(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    budget: int,
    decimal_scale: int = 2,
) -> DataFrame:
    """Optimal (Neyman) stratified-sample allocation: for a total budget of
    ``budget`` rows, stratum h gets n_h = budget · N_h·σ_h / Σ(N_g·σ_g) —
    minimizing the variance of the stratified mean estimator. The
    design-of-experiments step BEFORE ``stratified_sample``: allocate by
    within-stratum variability, not just size (a huge homogeneous stratum
    needs few samples; a small volatile one needs many).

    σ_h comes from DECIMAL-exact sufficient statistics (n, Σx, Σx²) in one
    aggregation pass — the only float ops are the final sqrt/divisions,
    identical order both engines. The value casts to DECIMAL(18,s) so the
    square stays within 38 digits of precision in BOTH engines (a 27-digit
    operand would overflow DuckDB's product width). Returns per-stratum
    (N, sigma, allocation) with the allocation as a REAL number (callers
    round with their preferred apportionment)."""
    x = F.col(value_col).cast(f"decimal(18,{decimal_scale})")
    stats = df.groupBy(stratum_col).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(x).alias("__s"),
        F.sum(x * x).alias("__ss"),
    )
    n = F.col("__n").cast("double")
    s = F.col("__s").cast("double")
    ss = F.col("__ss").cast("double")
    # a singleton stratum has no sample variance: weight 0 (ANSI division
    # by n-1 = 0 would throw)
    sigma = F.when(
        F.col("__n") > 1, F.sqrt((ss - s * s / n) / (n - 1))
    ).otherwise(F.lit(0.0))
    weighted = stats.select(
        stratum_col,
        F.col("__n").cast("bigint").alias("n_rows"),
        F.round(sigma, 6).alias("sigma"),
        (n * sigma).alias("__w"),
    )
    total = weighted.agg(
        F.sum("__w").alias("__tw"), F.sum("n_rows").alias("__tn")
    )
    # Σ N_g·σ_g = 0 (every stratum singleton or constant-valued) carries no
    # variance signal to allocate by: ANSI division would throw, and any
    # 0/0 convention is arbitrary — fall back to proportional-to-N
    # allocation, the textbook degenerate case (round-5 ADVICE)
    alloc = F.when(
        F.col("__tw") > 0,
        F.lit(float(budget)) * F.col("__w") / F.col("__tw"),
    ).otherwise(
        F.lit(float(budget))
        * F.col("n_rows").cast("double")
        / F.col("__tn").cast("double")
    )
    return weighted.crossJoin(F.broadcast(total)).select(
        stratum_col,
        "n_rows",
        "sigma",
        F.round(alloc, 6).alias("allocation"),
    )


def effective_sample_size(df: DataFrame, weight_col: str) -> DataFrame:
    """Kish effective sample size of a weighted corpus: ESS = (Σw)²/Σw²,
    with the design effect n/ESS. The one-number audit for any
    reweighting scheme (soft-dedup 1/cluster-size weights, DSIR
    importance weights, temperature mixes): how many EQUAL-weight
    documents is this weighted corpus statistically worth, and how much
    variance did the weighting cost. ESS = n means the weights are doing
    nothing; ESS ≪ n means a few heavy documents dominate every
    estimate — cap or renormalize before training.

    One aggregation pass with map-side combine (three sums). Returns one
    row (n_rows, ess, design_effect); NULL when the weight mass is 0
    (no sampling design to speak of; ANSI-safe)."""
    agg = df.filter(F.col(weight_col).isNotNull()).agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.sum(F.col(weight_col).cast("double")).alias("__s"),
        F.sum(
            F.col(weight_col).cast("double") * F.col(weight_col).cast("double")
        ).alias("__ss"),
    )
    ess = F.col("__s") * F.col("__s") / F.col("__ss")
    return agg.select(
        F.col("__n").cast("bigint").alias("n_rows"),
        F.when(F.col("__ss") > 0, F.round(ess, 6)).alias("ess"),
        F.when(F.col("__ss") > 0, F.round(F.col("__n") / ess, 6)).alias(
            "design_effect"
        ),
    )


def exact_k_sample(
    df: DataFrame, k: int, text_col: str = "text"
) -> DataFrame:
    """EXACT-size deterministic uniform sample: the ``k`` rows with the
    smallest content-hash keys. The fraction-based samplers
    (``hash_split``/``stratified_sample``) give a binomially-varying
    size; evaluation sets, benchmark slices, and quota contracts need
    exactly k — and the same k, in any engine, on any partitioning, on
    re-ingestion (the reservoir-sampling use case without its
    order-dependence). Ties on the 16-byte hash are broken by the hash's
    full text via the second sort key.

    One ``orderBy().limit(k)`` — a distributed TakeOrderedAndProject
    carrying k rows per partition then k total, never a global sort."""
    return (
        df.withColumn("__key", F.md5(F.col(text_col)))
        .orderBy(F.col("__key"), F.col(text_col))
        .limit(k)
        .drop("__key")
    )


def kfold_assign(
    df: DataFrame, n_folds: int = 5, text_col: str = "text"
) -> DataFrame:
    """Deterministic k-fold assignment by content hash: fold =
    md5-uniform bucket of the text, so folds are stable across runs,
    engines and re-partitioning, and EXACT-duplicate texts always share
    a fold (same bytes => same hash => same fold). NEAR-copies — different
    bytes, high Jaccard — hash independently and CAN straddle folds; when
    the corpus carries near-dups and the CV score must not be inflated by
    paraphrase leakage, use ``cluster_safe_kfold`` below, which keys the
    fold on the near-dup CLUSTER id instead of the member text. Pure
    projection — the cross-validation companion to ``hash_split``'s
    train/val/test."""
    u48 = F.conv(F.substring(F.md5(F.col(text_col)), 1, 12), 16, 10).cast(
        "bigint"
    )
    return df.withColumn("fold", (u48 % n_folds).cast("int"))


def cluster_safe_kfold(
    df: DataFrame,
    edges: DataFrame,
    n_folds: int = 5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Leakage-safe k-fold assignment: every member of a near-duplicate
    CLUSTER lands in the same fold, so cross-validation never scores a
    model on a paraphrase of its own training fold. ``kfold_assign``
    pins only EXACT duplicates (fold = hash of the member's own text);
    this is the cross-validation mirror of ``cluster_safe_split`` — the
    fold keys on the cluster id (connected components over the near-dup
    pair graph, min-id labeled), so near-copies inherit ONE assignment
    by construction, not by hash luck. Cost: the components iteration
    over the pair graph (already computed for dedup); the fold itself
    stays a pure projection over the labeled frame."""
    from split_kinesis_streams_with_glue_spark.operators.graph import cluster_labels

    labeled = cluster_labels(df, edges, id_col)
    u48 = F.conv(
        F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 12), 16, 10
    ).cast("bigint")
    return labeled.withColumn("fold", (u48 % n_folds).cast("int"))


def priority_sample(
    df: DataFrame, k: int, weight_col: str, text_col: str = "text"
) -> DataFrame:
    """Deterministic weighted EXACT-k sample by priority sampling
    (Duffield, Lund & Thorup, JACM 2007): each row gets priority
    q = w / u with u uniform on (0, 1], and the k highest-priority rows
    form the sample — heavy rows are proportionally favored while the
    sample size is exactly k (``weighted_sample``'s PPS filter only hits
    k in expectation; ``exact_k_sample`` is exact but unweighted — this
    is the missing exact-AND-weighted corner).

    Determinism and cross-engine exactness shape the arithmetic: u comes
    from 48 bits of the CONTENT md5 (duplicate-stable, engine-portable),
    and the priority is the single IEEE division
    ``w * 2^48 / (u48 + 1)`` — multiplication and division of exactly-
    representable integers, correctly rounded identically by every IEEE
    engine, so the top-k CUT is bit-reproducible (the Efraimidis-
    Spirakis u^(1/w) key needs pow/ln, whose last-ulp behavior is
    libm-dependent — same reason the PPS sampler avoids them). Ties are
    impossible short of an md5 collision but the sort still carries the
    text as a second key. One orderBy().limit(k): a distributed
    TakeOrderedAndProject carrying k rows per partition, never a global
    sort."""
    u48 = F.conv(F.substring(F.md5(F.col(text_col)), 1, 12), 16, 10).cast(
        "bigint"
    )
    prio = (
        F.col(weight_col).cast("double")
        * F.lit(float(1 << 48))
        / (u48 + F.lit(1)).cast("double")
    )
    return (
        df.withColumn("priority", prio)
        .orderBy(F.col("priority").desc(), F.col(text_col))
        .limit(k)
    )


def horvitz_thompson_total(
    df: DataFrame,
    y_col: str,
    weight_col: str,
    sampling_fraction_num: int = 1,
    sampling_fraction_den: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """Horvitz-Thompson estimation (Horvitz & Thompson, JASA 1952) of a
    population total from a deterministic Poisson PPS sample: row i
    enters the sample iff u_i < pi_i, with inclusion probability
    pi_i = min(1, c * w_i / mean(w)) where c is the target sampling
    fraction, and the estimator sums y_i / pi_i over SAMPLED rows only.
    The estimator the sampling family lacked: the samplers
    (pps/priority/stratified) produce subsets, but a pipeline that
    reports "estimated total tokens in the full corpus" from a sample
    needs the unbiased inverse-probability reweighting AND its variance
    — for Poisson designs Var = sum (1-pi)/pi^2 * y^2, estimated from
    the same sampled rows.

    Determinism and portability: u_i is 48 content-hash bits scaled by
    2^-48 (the family's md5-uniform idiom — duplicate-stable, identical
    in any engine); pi derives from one broadcast 1-row mean-weight
    aggregate; the inclusion test is plain IEEE arithmetic in a fixed
    association order. The two estimator sums accumulate 6-dp-ROUNDED
    terms as DECIMAL(38,6) — a grouped double SUM is accumulation-order
    nondeterministic, and at sf0.1 the variance sum reaches 1e9
    magnitude where 6-dp output rounding is FINER than the double
    accumulation error (caught by the round-8 sf0.1 sweep: last-decimal
    divergence across engines); decimal term-sums are exact and
    order-free in both engines. Two scans of the weight column (mean,
    then score) and one filtered fold — no sort, no shuffle beyond the
    1-row aggregates.

    Returns one row (n_population, n_sampled, ht_total, ht_variance,
    true_total) — true_total included because at audit time the full
    frame is present; production use drops it."""
    u48 = F.conv(F.substring(F.md5(F.col(text_col)), 1, 12), 16, 10).cast(
        "bigint"
    )
    u = u48.cast("double") / F.lit(float(1 << 48))
    mean_w = df.agg(
        F.avg(F.col(weight_col).cast("double")).alias("__mw"),
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col(y_col).cast("double")).alias("__true"),
    )
    c = F.lit(float(sampling_fraction_num)) / F.lit(
        float(sampling_fraction_den)
    )
    scored = df.crossJoin(F.broadcast(mean_w)).select(
        F.col(y_col).cast("double").alias("__y"),
        F.least(
            F.lit(1.0),
            c * F.col(weight_col).cast("double") / F.col("__mw"),
        ).alias("__pi"),
        u.alias("__u"),
        F.col("__n"),
        F.col("__true"),
    )
    return scored.filter(F.col("__u") < F.col("__pi")).agg(
        F.max("__n").cast("bigint").alias("n_population"),
        F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
        F.sum(
            F.round(F.col("__y") / F.col("__pi"), 6).cast("decimal(38,6)")
        )
        .cast("double")
        .alias("ht_total"),
        F.sum(
            F.round(
                (F.lit(1.0) - F.col("__pi"))
                / (F.col("__pi") * F.col("__pi"))
                * F.col("__y")
                * F.col("__y"),
                6,
            ).cast("decimal(38,6)")
        )
        .cast("double")
        .alias("ht_variance"),
        F.round(F.max("__true"), 6).alias("true_total"),
    )


def token_budget_fill(
    df: DataFrame,
    group_col: str,
    tokens_col: str,
    quality_col: str,
    budget: int,
) -> DataFrame:
    """Quality-greedy token-budget allocation across sources (the
    fractional-knapsack mixing step of a training-data pipeline): rank
    groups by quality score descending, admit whole groups while the
    cumulative token count fits the budget, and give the first group
    that overflows the REMAINING budget as a fractional take — the
    classic greedy that is optimal for the fractional knapsack (Dantzig
    1957). The mixture-building operator the pipeline family lacked:
    scorecards rank sources, samplers subset rows, but "fill a 10M-token
    budget best-quality-first, telling me each source's take fraction"
    is an allocation, not a sample.

    One grouped pass collapses the corpus to per-group (tokens, quality)
    rows; ranking, the running-total window and the fill arithmetic run
    over that bounded source frame (sources number in the hundreds at
    any corpus size — the documented bounded-global-window pattern).
    Integer token counts make every cumulative comparison exact; the
    fraction is one IEEE division, rounded.

    Returns per-group rows (group, quality, group_tokens, cum_before,
    take_tokens, take_fraction) for groups with take_tokens > 0."""
    from pyspark.sql import Window

    per = df.groupBy(F.col(group_col).alias("group")).agg(
        F.sum(F.col(tokens_col).cast("bigint")).alias("group_tokens"),
        F.round(F.avg(F.col(quality_col).cast("double")), 6).alias("quality"),
    )
    w = Window.orderBy(F.col("quality").desc(), F.col("group").asc())
    cum = per.withColumn(
        "cum_before",
        F.coalesce(
            F.sum("group_tokens").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("bigint"),
    )
    remaining = F.greatest(F.lit(budget).cast("bigint") - F.col("cum_before"), F.lit(0))
    take = F.least(F.col("group_tokens"), remaining)
    return (
        cum.select(
            "group",
            "quality",
            F.col("group_tokens").cast("bigint").alias("group_tokens"),
            "cum_before",
            take.cast("bigint").alias("take_tokens"),
            F.round(
                take.cast("double") / F.col("group_tokens").cast("double"), 6
            ).alias("take_fraction"),
        )
        .filter(F.col("take_tokens") > 0)
    )


def quantile_normalize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-group quantile normalization (Bolstad et al.,
    Bioinformatics 2003, adapted to a reference-global mapping): each
    row's value is replaced by the GLOBAL order statistic at its
    within-group quantile position — after which every group has (a
    subsample of) the same distribution. The score-calibration step a
    multi-source mixing pipeline needs before comparing per-source
    quality/length scores on one scale: two sources whose raw scores
    live on different ranges become rank-comparable without fitting any
    parametric transform (the nonparametric companion to
    temperature_sample's power reweighting).

    Exactness and scale shape: the within-group rank is a partitioned
    window; the global order statistics come from
    ``partitioning.global_rank`` (the two-pass range rank — no
    single-partition window); the index mapping
    ``idx = 1 + (r−1)(N−1) div (n−1)`` is exact-integral ``div`` over
    DECIMAL(38,0) operands — the product cannot overflow BIGINT at
    100 TB row counts, and ``div`` (unlike ``floor`` of a Spark decimal
    division, which HALF_UP-rounds to scale 6 first) never floors one
    too high. The mapped value comes from one EQUI-join on the rank.
    A single-row group (no quantile position) maps to the global
    median index (N+1) div 2. Everything is integer arithmetic — no
    float percent_rank whose last ulp could flip an index
    cross-engine.

    Tie contract: equal values occupy contiguous global ranks, so the
    mapped VALUE is well-defined regardless of tie order; ranks still
    carry ``id_col`` as the final key so both passes are total orders.

    Returns (id, group, value, normalized value)."""
    from pyspark.sql import Window

    from split_kinesis_streams_with_glue_spark.partitioning import global_rank

    base = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(id_col).alias("__id"),
        F.col(group_col).alias("__grp"),
        F.col(value_col).alias("__v"),
    )
    wg = Window.partitionBy("__grp").orderBy(
        F.col("__v").asc(), F.col("__id").asc()
    )
    wc = Window.partitionBy("__grp")
    ranked = base.select(
        "__id",
        "__grp",
        "__v",
        F.row_number().over(wg).alias("__r"),
        F.count(F.lit(1)).over(wc).alias("__n"),
    )
    glob = global_rank(
        base.select(F.col("__v").alias("__gv"), F.col("__id").alias("__gid")),
        "__gv",
        "__gid",
        rank_col="__grn",
    ).select("__gv", "__grn")
    nn = base.agg(F.count(F.lit(1)).alias("__tot"))
    # `div`, NOT floor(decimal /): Spark's decimal division HALF_UP-rounds
    # to scale 6 BEFORE the floor, so a quotient with fraction >= .9999995
    # floors one too high (e.g. 19999999 / 10000001 -> 2.000000 -> 2,
    # where the exact integral quotient is 1); `div` computes the exact
    # integral quotient on the unrounded decimals
    idx = F.when(
        F.col("__n") > 1,
        (
            F.expr(
                "(CAST(__r - 1 AS DECIMAL(38,0))"
                " * CAST(__tot - 1 AS DECIMAL(38,0)))"
                " div CAST(__n - 1 AS DECIMAL(38,0))"
            )
            + 1
        ).cast("bigint"),
    ).otherwise(
        F.expr(
            "CAST(__tot + 1 AS DECIMAL(38,0)) div CAST(2 AS DECIMAL(38,0))"
        ).cast("bigint")
    )
    return (
        ranked.crossJoin(F.broadcast(nn))
        .withColumn("__idx", idx)
        .join(glob, F.col("__idx") == F.col("__grn"))
        .select(
            F.col("__id").alias(id_col),
            F.col("__grp").alias(group_col),
            F.col("__v").alias(value_col),
            F.col("__gv").alias(f"norm_{value_col}"),
        )
    )


def lightweight_coreset(
    df: DataFrame,
    m: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lightweight k-means coreset (Bachem, Lucic & Krause, KDD 2018):
    importance q(x) = 1/(2n) + d²(x, μ)/(2·Σd²) against the corpus MEAN
    — provably a coreset for k-means with sampling proportional to q,
    at the cost of ONE pass over the data (no k-means++ seeding chain).
    The embedding-subset selector the sampling family lacked: hash
    splits are blind to geometry, sim_sample_diversity measures spread
    but selects nothing; this picks the m points that preserve the
    clustering objective, upweighting far-from-center structure.

    Determinism and scale shape: μ comes from per-dimension
    DECIMAL(38,6) sums of 6-dp-rounded coordinates (exact, order-free —
    the registry's accumulation convention) rebuilt into a broadcast
    1-row array; d² is a left-to-right zip_with fold (the engine's
    ``dot`` association order, mirrored by DuckDB's list_sum); Σd² sums
    the 6-dp-ROUNDED d² terms as DECIMAL(38,6); selection is
    Duffield-Lund-Thorup priority sampling (q·2^48/(u48+1), u48 = 48
    md5 bits of the id — the priority_sample idiom) via one
    TakeOrderedAndProject. Degenerate all-identical input (Σd² = 0)
    falls back to uniform q = 1/n on both engines.

    Returns the m selected rows (id, dist2, q_prob, weight) with the
    standard importance weight 1/(m·q)."""
    pos = df.select(F.posexplode(F.col(vec_col)).alias("__pos", "__pv"))
    mu = (
        pos.groupBy("__pos")
        .agg(
            (
                F.sum(
                    F.round(F.col("__pv").cast("double"), 6).cast(
                        "decimal(38,6)"
                    )
                ).cast("double")
                / F.count(F.lit(1))
            ).alias("__m")
        )
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__m"))),
                lambda x: x["__m"],
            ).alias("__mu")
        )
    )
    d2 = F.round(
        F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.col("__mu"),
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    scored = df.crossJoin(F.broadcast(mu)).select(
        F.col(id_col), d2.alias("__d2")
    )
    tot = scored.agg(
        F.sum(F.col("__d2").cast("decimal(38,6)")).cast("double").alias("__sd2"),
        F.count(F.lit(1)).alias("__n"),
    )
    q = F.when(
        F.col("__sd2") > 0,
        F.lit(0.5) / F.col("__n")
        + (F.lit(0.5) * F.col("__d2")) / F.col("__sd2"),
    ).otherwise(F.lit(1.0) / F.col("__n"))
    u48 = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 12), 16, 10
    ).cast("bigint")
    prio = (
        F.col("__q")
        * F.lit(float(1 << 48))
        / (u48 + F.lit(1)).cast("double")
    )
    return (
        scored.crossJoin(F.broadcast(tot))
        .withColumn("__q", q)
        .orderBy(prio.desc(), F.col(id_col).asc())
        .limit(m)
        .select(
            id_col,
            F.col("__d2").alias("dist2"),
            F.round("__q", 6).alias("q_prob"),
            F.round(F.lit(1.0) / (F.lit(float(m)) * F.col("__q")), 6).alias(
                "weight"
            ),
        )
    )


def raking_ipf(
    df: DataFrame,
    row_col: str,
    col_col: str,
    n_iters: int = 4,
) -> DataFrame:
    """Raking / iterative proportional fitting (Deming & Stephan, AMS
    1940): cell weights over the ``row_col`` × ``col_col`` contingency
    table scaled so the WEIGHTED marginals match targets — here the
    canonical survey-calibration choice of a UNIFORM row target (every
    row category gets an equal share of the total) while column
    marginals stay at their observed totals. The dataset-mixing
    primitive the sampling family lacked: temperature/stratified
    sampling rebalance ONE dimension; raking finds the (maximum-entropy,
    Ireland & Kullback 1968) cell weights that satisfy BOTH marginal
    constraints at once — "equalize languages without disturbing the
    source mix".

    Scale shape: ONE corpus pass collapses the data to the bounded
    |rows|×|cols| cell frame; the ``n_iters`` alternating row/col
    scalings run on THAT frame (each step two grouped aggregates + a
    broadcast join — bounded whatever the corpus size). The cell frame
    is MATERIALIZED once after the collapse and re-pinned after every
    iteration (``localCheckpoint(eager=True)`` — the pagerank /
    connected-components idiom, ``operators/graph.py``): each scaling
    step references the frame twice (directly and through its marginal
    aggregate), so an unpinned loop re-embeds the corpus collapse
    exponentially — the round-9 executed plan held 768 FileScan nodes
    before this pin; with it the corpus is scanned once and the plan is
    linear in ``n_iters`` (fenced registry-wide by the scan-multiplicity
    gate in ``plans/lint.py``).

    Cross-engine exactness across iterations demanded a stronger recipe
    than the family's DECIMAL term-sums: a DECIMAL(38,9)·LONG product
    trips Spark's precision-loss scale reduction (the product silently
    re-rounds at scale 6 — caught by the sf0.001 parity run of the
    decimal-state draft), so the weight state is a plain INTEGER in
    nano-units (w9 = round(w·1e9) as BIGINT). Marginal sums Σ w9·n are
    then exact order-free integers (DECIMAL(38,0) against overflow);
    each scaling computes the factor in IEEE doubles from exact inputs
    and re-rounds the state to the integer grid; the OUTPUT rounding to
    6 dp happens in INTEGER space — (w9 + 500) div 1000 — so the
    digits-7-9-are-500 decimal tie that burned the first draft cannot
    exist (there is no float round of a 9-dp decimal anywhere).
    Documented contract: total·1e9 must stay under 2^53 (exact-double
    range) — at larger corpora raise the state grain.

    Returns one row per observed cell (row value, col value, n,
    weight); a weighted resample then draws each cell at
    n·weight/Σ(n·weight)."""
    cells = (
        df.filter(F.col(row_col).isNotNull() & F.col(col_col).isNotNull())
        .groupBy(F.col(row_col).alias("__r"), F.col(col_col).alias("__c"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("__w9", F.lit(1000000000).cast("bigint"))
    )
    tot = cells.agg(
        F.sum("__n").alias("__tot"),
        F.countDistinct("__r").alias("__nr"),
    )
    coltgt = cells.groupBy("__c").agg(F.sum("__n").alias("__ct"))
    # pin the bounded cell frame: ONE corpus scan, truncated lineage —
    # every later step runs on the materialized |rows|×|cols| cells
    cells = (
        cells.crossJoin(F.broadcast(tot))
        .join(F.broadcast(coltgt), "__c")
        .localCheckpoint(eager=True)
    )
    # targets in nano-units: exact doubles while total*1e9 < 2^53
    row_target9 = (
        F.col("__tot").cast("double") * F.lit(1e9)
    ) / F.col("__nr").cast("double")
    col_target9 = F.col("__ct").cast("double") * F.lit(1e9)
    w9sum = lambda: F.sum(
        F.col("__w9").cast("decimal(38,0)") * F.col("__n")
    ).cast("double")
    for _ in range(n_iters):
        rsum = cells.groupBy("__r").agg(w9sum().alias("__rs9"))
        cells = (
            cells.join(F.broadcast(rsum), "__r")
            .withColumn(
                "__w9",
                F.round(
                    F.col("__w9").cast("double")
                    * (row_target9 / F.col("__rs9")),
                    0,
                ).cast("bigint"),
            )
            .drop("__rs9")
        )
        csum = cells.groupBy("__c").agg(w9sum().alias("__cs9"))
        cells = (
            cells.join(F.broadcast(csum), "__c")
            .withColumn(
                "__w9",
                F.round(
                    F.col("__w9").cast("double")
                    * (col_target9 / F.col("__cs9")),
                    0,
                ).cast("bigint"),
            )
            .drop("__cs9")
            # re-pin per iteration: the next scaling references this
            # frame twice; without the pin the plan doubles every step
            .localCheckpoint(eager=True)
        )
    # 6-dp output in INTEGER space: HALF_UP = (w9 + 500) div 1000 as
    # exact integral `div` (NOT floor of a double quotient, whose last
    # ulp could flip near 2^53), then one exact double division by 1e6
    # — no float rounding of a 9-dp decimal anywhere, no decimal ties
    w6 = F.expr(
        "CAST(__w9 + 500 AS DECIMAL(38,0)) div CAST(1000 AS DECIMAL(38,0))"
    )
    return cells.select(
        F.col("__r").alias(row_col),
        F.col("__c").alias(col_col),
        F.col("__n").cast("bigint").alias("n"),
        (w6.cast("double") / F.lit(1e6)).alias("weight"),
    )


def systematic_sample(df: DataFrame, m: int, *order_cols: str) -> DataFrame:
    """Systematic (fractional-interval) sampling (Madow & Madow, "On the
    theory of systematic sampling", AoMS 1944): order the population by
    ``order_cols``, then keep row r iff ⌊r·m/N⌋ > ⌊(r−1)·m/N⌋ — exactly
    ``m`` rows (for 0 < m ≤ N), maximally spread across the order, with
    NO randomness. The deterministic complement of sample_exact_k /
    sample_weighted_pps: when the order column is a quality or length
    score, the sample is a stratified sweep of the whole distribution —
    the standard eyeball-sample for a curation review.

    Ranks come from ``partitioning.global_rank`` (two-pass range
    partition + per-partition windows + broadcast offsets — no
    single-partition sort at any scale); N is the broadcast 1-row max
    rank; the keep rule is pure int64 arithmetic (caller contract:
    r·m < 2^63, i.e. m below ~9e18/N — any real m qualifies).
    Caller contract inherited from global_rank: ``order_cols`` must be
    a NULL-free total order (append a unique id last).

    Returns the sampled rows with their original columns."""
    from split_kinesis_streams_with_glue_spark.partitioning import global_rank

    # m is interpolated into a SQL expression below — validate the
    # documented 0 < m contract up front (m <= 0 would silently return an
    # empty frame; a non-int would be a malformed expression at analysis)
    if not isinstance(m, int) or isinstance(m, bool) or m < 1:
        raise ValueError(f"m must be a positive int, got {m!r}")
    ranked = global_rank(df, *order_cols, rank_col="__sys_rn")
    tot = ranked.agg(F.max("__sys_rn").alias("__sys_n"))
    kept = (
        ranked.crossJoin(F.broadcast(tot))
        .filter(
            F.expr(f"(__sys_rn * {m}L) DIV __sys_n")
            > F.expr(f"((__sys_rn - 1) * {m}L) DIV __sys_n")
        )
        .drop("__sys_rn", "__sys_n")
    )
    return kept
