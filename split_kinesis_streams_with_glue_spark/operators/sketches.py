"""Mergeable distinct-count sketches (HyperLogLog) for rollup tables.

``approx_count_distinct`` answers ONE query; a stored sketch answers every
range query after the fact. The pattern: aggregate each time bucket (or any
rollup cell) into a serialized HLL sketch once, then answer "distinct users
over ANY day range / cell union" by merging just those buckets' sketches —
no rescan of the raw events. Merging is associative and commutative, so
Spark executes it as a partial + final aggregate, and the sketch table is
tiny (one row per bucket, ~1-2 KB per sketch) regardless of event volume.

At 100 TB this is the difference between answering a 90-day distinct-users
question from 90 kilobyte-sized rows and re-scanning a quarter of the fact
table. Exactness is bounded: Spark's HLL++ at default lgConfigK=12 has a
standard error of ~1.6%; the registry contract query pins observed error
<= 5% against the exact count.

All built-in expressions (``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``) — JVM-side, codegen-compatible, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bucket_sketches(
    df: DataFrame,
    bucket: Column,
    key: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """One HLL sketch of ``key`` per (bucket, *group_cols) cell — the
    materializable rollup table. Columns: bucket, *group_cols, sketch,
    n_rows (exact row count rides along for free)."""
    group_cols = group_cols or []
    return df.groupBy(bucket.alias("bucket"), *group_cols).agg(
        F.hll_sketch_agg(key).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def range_distinct(
    sketches: DataFrame,
    bucket_filter: Column,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Approximate distinct count over any union of buckets, answered from
    the sketch table alone: filter buckets, merge sketches, estimate."""
    group_cols = group_cols or []
    merged = sketches.filter(bucket_filter).groupBy(*group_cols).agg(
        F.hll_union_agg("sketch").alias("merged"),
        F.sum("n_rows").alias("n_rows"),
    )
    return merged.select(
        *group_cols,
        F.hll_sketch_estimate("merged").alias("approx_distinct"),
        "n_rows",
    )


# ---------------------------------------------------------------------------
# Count-min sketch — mergeable frequency table for heavy hitters
# ---------------------------------------------------------------------------
#
# Spark ships a count_min_sketch AGGREGATE but no SQL-side point-query over
# its opaque binary, so a stored sketch would need driver-side
# deserialization to answer anything. We instead materialize the sketch AS A
# TABLE — depth x width rows of (d, bucket, cnt) — which keeps both halves
# of the pattern distributed: build is one explode + groupBy (partial aggs
# combine map-side, merging two sketches is a union + re-sum), and a point
# query is an equi-join on (d, bucket) + min() — no UDF, no binary blob, no
# driver round-trip. At 100 TB the sketch table is depth*width rows (~20k)
# regardless of input size.
#
# Guarantee (Cormode & Muthukrishnan 2005): estimate >= true count always;
# estimate <= true + eps*N with probability 1 - delta for width = e/eps,
# depth = ln(1/delta).


def cms_build(df: DataFrame, key: str, depth: int = 5, width: int = 4096) -> DataFrame:
    """Count-min sketch of ``key`` frequencies as a (d, bucket, cnt) table.

    Each row contributes one count to one bucket per hash row; hash rows use
    xxhash64 salted with the row index (JVM-side, codegen). Weighted
    variants would swap count(1) for sum(weight).
    """
    rows = F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("d")
    return (
        df.select(F.col(key).alias("__k"))
        .select(rows, F.col("__k"))
        .select("d", F.pmod(F.xxhash64("d", "__k"), F.lit(width)).alias("bucket"))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, items: DataFrame, key: str, depth: int = 5, width: int = 4096
) -> DataFrame:
    """Point-query the sketch table for each row of ``items``: estimate =
    min over hash rows of the landed bucket's count. ``items`` keeps its
    other columns (note: exact duplicate rows in ``items`` collapse to one
    output row — the estimate is per distinct probe). Join shape: items x
    depth (small) equi-joined to the sketch (<= depth*width rows,
    broadcastable)."""
    rows = F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("d")
    probes = items.select(
        *items.columns, rows
    ).withColumn("bucket", F.pmod(F.xxhash64("d", F.col(key)), F.lit(width)))
    est = (
        probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(*items.columns)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate"))
    )
    return est


# ---------------------------------------------------------------------------
# Bloom filter — tiny broadcastable membership set
# ---------------------------------------------------------------------------
#
# bloom_filter_agg exists in Spark's optimizer for runtime row-level
# filtering but is NOT registered as a user-facing SQL function, so we build
# the classic bit array explicitly from codegen primitives: k salted
# xxhash64 positions per item, OR-folded into 64-bit words. The filter is a
# map<word_index, bits> with at most m/64 entries — kilobytes for millions
# of members — so the membership side of a decontamination join broadcasts
# even when the member list itself would not. Merging two filters over the
# same (m, k) is a union + bit_or on word index.
#
# No false negatives ever; false-positive rate ~ (1 - e^(-k*n/m))^k.


def bloom_build(df: DataFrame, key: str, m_bits: int, k_hashes: int = 7) -> DataFrame:
    """Build the filter: ONE row with column ``bloom`` = map<int,bigint> of
    set 64-bit words (plus n_words for introspection)."""
    hashes = F.explode(F.array(*[F.lit(h) for h in range(k_hashes)])).alias("h")
    words = (
        df.select(F.col(key).alias("__k"))
        .select(hashes, F.col("__k"))
        .select(F.pmod(F.xxhash64("h", "__k"), F.lit(m_bits)).alias("pos"))
        .select(
            (F.col("pos") / 64).cast("int").alias("word"),
            # F.shiftleft only takes a literal shift amount; the SQL
            # function accepts a column
            F.call_function(
                "shiftleft", F.lit(1).cast("bigint"), (F.col("pos") % 64).cast("int")
            ).alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("bloom"),
        F.count(F.lit(1)).alias("n_words"),
    )


def bloom_might_contain(
    bloom: Column, item: Column, m_bits: int, k_hashes: int = 7
) -> Column:
    """Membership test expression against a ``bloom_build`` map column.
    k codegen'd bit probes AND-folded; true => possibly member, false =>
    definitely not."""
    cond = F.lit(True)
    for h in range(k_hashes):
        pos = F.pmod(F.xxhash64(F.lit(h), item), F.lit(m_bits))
        word = (pos / 64).cast("int")
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("bigint"), (pos % 64).cast("int")
        )
        cond = cond & (
            F.coalesce(F.element_at(bloom, word), F.lit(0).cast("bigint")).bitwiseAND(
                bit
            )
            != 0
        )
    return cond


def cms_inner_product(
    sketch_a: DataFrame, sketch_b: DataFrame, depth: int = 5
) -> DataFrame:
    """Equi-join SIZE estimate from two count-min sketches built with the
    same (depth, width): |A ⋈_k B| ≈ min over hash rows d of
    Σ_bucket cntA(d,b)·cntB(d,b) (Cormode & Muthukrishnan 2005, §4.2).
    Never underestimates; overshoot ≤ (e/width)·|A|·|B| per row w.h.p.

    The planner-side use: join-size/selectivity estimation BEFORE running a
    join, from two ≤ depth×width-row summaries that were built in one scan
    each and are mergeable across partitions/days — no sampling pass over
    either input. Output: one row (join_size_estimate bigint)."""
    a = sketch_a.alias("a")
    b = sketch_b.alias("b")
    per_row = (
        a.join(b, ["d", "bucket"])  # inner: absent buckets contribute 0
        .groupBy("d")
        .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("dot"))
    )
    return per_row.agg(
        F.min("dot").cast("bigint").alias("join_size_estimate")
    )


def bloom_prefilter_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 1 << 16,
    k_hashes: int = 7,
) -> DataFrame:
    """Runtime-filtered equi-join: build a Bloom filter over the dim keys
    (kilobytes regardless of dim size), drop fact rows that cannot match
    BEFORE the join, then exact-join the survivors. Because a Bloom filter
    has no false negatives, the result is row-identical to the plain join;
    false positives just ride through to the exact join and fall out.

    This is the explicit, engine-portable form of the optimizer's
    runtime-filter/DPP trick: at 100 TB the win is shuffle volume — only
    fact rows that can match pay the exchange, and the membership side
    broadcasts even when the dim's key list would not."""
    bloom = bloom_build(dim, dim_key, m_bits, k_hashes)
    pre = fact.crossJoin(F.broadcast(bloom)).filter(
        bloom_might_contain(F.col("bloom"), F.col(fact_key), m_bits, k_hashes)
    ).drop("bloom", "n_words")
    return pre.join(dim, pre[fact_key] == dim[dim_key])


# ---------------------------------------------------------------------------
# Equi-width histogram sketch — mergeable quantile summaries
# ---------------------------------------------------------------------------
#
# Completes the stored-sketch family: HLL answers distincts, CMS answers
# frequencies, this answers QUANTILES over any bucket union after the fact.
# Per rollup cell keep n_bins counts on a SHARED global grid; merging cells
# is a per-bin sum (associative), and any quantile of any union is answered
# from the merged n_bins rows with error bounded by one bin's mass + width.
# approx_percentile answers one query per scan; the sketch table answers
# every later range/rollup quantile from kilobytes.


def value_histogram(
    df: DataFrame,
    value_col: str,
    n_bins: int = 256,
    bucket: Column | None = None,
) -> DataFrame:
    """(bucket?, bin, bin_lo, bin_hi, cnt) on a shared min/max grid (one
    tiny bounds agg, broadcast back). Values at the top edge clamp into the
    last bin."""
    bounds = df.agg(
        F.min(value_col).cast("double").alias("__lo"),
        F.max(value_col).cast("double").alias("__hi"),
    )
    width = (F.col("__hi") - F.col("__lo")) / n_bins
    safe_width = F.when(width > 0, width).otherwise(F.lit(1.0))
    binned = (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(
            "bin",
            F.least(
                F.lit(n_bins - 1),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.col(value_col).cast("double") - F.col("__lo")) / safe_width
                    ),
                ),
            ).cast("int"),
        )
        .withColumn("bin_lo", F.col("__lo") + F.col("bin") * safe_width)
        .withColumn("bin_hi", F.col("__lo") + (F.col("bin") + 1) * safe_width)
    )
    keys = (["bucket"] if bucket is not None else []) + ["bin"]
    if bucket is not None:
        binned = binned.withColumn("bucket", bucket)
    return binned.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.first("bin_lo").alias("bin_lo"),
        F.first("bin_hi").alias("bin_hi"),
    )


def histogram_quantile(hist: DataFrame, q: float) -> DataFrame:
    """Estimate the q-quantile from a (merged) histogram frame: one row
    (est, n_total). Merging first is a per-bin sum; the running-total
    window is over n_bins rows — bounded regardless of data volume."""
    merged = hist.groupBy("bin").agg(
        F.sum("cnt").alias("cnt"),
        F.first("bin_lo").alias("bin_lo"),
        F.first("bin_hi").alias("bin_hi"),
    )
    w = Window.orderBy("bin")  # bounded: n_bins rows
    cum = merged.withColumn("cum", F.sum("cnt").over(w)).crossJoin(
        F.broadcast(merged.agg(F.sum("cnt").alias("n_total")))
    )
    hit = cum.filter(F.col("cum") >= F.lit(q) * F.col("n_total")).orderBy("bin").limit(1)
    return hit.select(
        ((F.col("bin_lo") + F.col("bin_hi")) / 2).alias("est"),
        F.col("n_total").cast("bigint").alias("n_total"),
    )
