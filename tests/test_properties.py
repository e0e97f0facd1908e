"""Property-based checks (Hypothesis) for operators whose correctness has
a crisp reference implementation: the operator must agree with the naive
form on arbitrary inputs, not just fixture-shaped ones.

Few examples per property (Spark round-trips are ~seconds each); seeds are
deterministic via Hypothesis' derandomize so CI never flakes.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

# Hypothesis sweeps are full-gate-only: 75 properties x 5 Spark round-trips
# each don't fit the driver's pytest budget (VERDICT r13 item 2).
pytestmark = pytest.mark.slow

SET = settings(max_examples=5, deadline=None, derandomize=True)

_words = st.text(alphabet="abcx", min_size=1, max_size=6)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@SET
@given(st.lists(_words, min_size=2, max_size=12, unique=True))
def test_fuzzy_pairs_matches_naive_levenshtein(spark, strings):
    """Symmetric-deletion blocking must find EXACTLY the distance<=1 pairs
    the quadratic scan finds — no false candidates surviving the verify,
    and (the real risk) no pair missed by the blocking scheme."""
    from split_kinesis_streams_with_glue_spark.operators.dedup import fuzzy_pairs

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strings)], "doc_id long, s string"
    )
    got = {
        (r["d1"], r["d2"]) for r in fuzzy_pairs(df, "s").collect()
    }
    want = {
        (i, j)
        for i in range(len(strings))
        for j in range(i + 1, len(strings))
        if _lev(strings[i], strings[j]) <= 1
    }
    assert got == want


@SET
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
            min_size=4,
            max_size=4,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_quantize_reconstruction_bound(spark, vecs):
    """Every dequantized component must sit within scale/2 of the original
    — including all-zero vectors (scale 0) and negative values."""
    from split_kinesis_streams_with_glue_spark.operators.quantize import (
        dequantize,
        quantize_int8,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    q = quantize_int8(df)
    worst = q.select(
        F.max(
            F.array_max(
                F.zip_with(
                    dequantize(F.col("qvec"), F.col("qscale")),
                    F.col("embedding"),
                    lambda a, b: F.abs(a - b) - F.col("qscale") * 0.5000001,
                )
            )
        ).alias("w")
    ).first()["w"]
    assert worst <= 0.0


@SET
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(-5, 5)),
        min_size=0,
        max_size=15,
    ),
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(-5, 5)),
        min_size=0,
        max_size=15,
    ),
)
def test_table_diff_apply_roundtrip_property(spark, old_rows, new_rows):
    """diff(old, new) applied to old must reproduce new, for arbitrary
    keyed tables (duplicate keys collapsed to one row per key)."""
    from pyspark.sql import functions as F

    from split_kinesis_streams_with_glue_spark.operators.diff import table_diff

    dedup_old = {k: v for k, v in old_rows}
    dedup_new = {k: v for k, v in new_rows}
    old = spark.createDataFrame(
        list(dedup_old.items()) or [(None, None)], "k int, v int"
    ).filter(F.col("k").isNotNull())
    new = spark.createDataFrame(
        list(dedup_new.items()) or [(None, None)], "k int, v int"
    ).filter(F.col("k").isNotNull())
    diff = table_diff(old, new, ["k"])
    touched = diff.select("k").distinct()
    applied = old.join(touched, "k", "left_anti").unionByName(
        diff.filter(F.col("operation") != "delete").drop("operation")
    )
    assert sorted(map(tuple, applied.collect())) == sorted(
        dedup_new.items()
    )


@SET
@given(st.lists(_words, min_size=2, max_size=12, unique=True))
def test_fuzzy_pairs_k2_matches_naive_levenshtein(spark, strings):
    """The delete-<=2 neighborhood blocking must find EXACTLY the
    distance<=2 pairs — the SymSpell guarantee at k=2, including the
    tricky cases (two deletions at adjacent positions, length-2 gaps)."""
    from split_kinesis_streams_with_glue_spark.operators.dedup import fuzzy_pairs

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strings)], "doc_id long, s string"
    )
    got = {
        (r["d1"], r["d2"]): r["dist"]
        for r in fuzzy_pairs(df, "s", max_distance=2).collect()
    }
    want = {
        (i, j): _lev(strings[i], strings[j])
        for i in range(len(strings))
        for j in range(i + 1, len(strings))
        if _lev(strings[i], strings[j]) <= 2
    }
    assert got == want


@SET
@given(
    st.lists(
        st.floats(min_value=-1000, max_value=1000, allow_nan=False),
        min_size=8,
        max_size=20,
    )
)
def test_autocorrelation_bounded_and_matches_naive(spark, xs):
    """Sample ACF agrees with the naive two-pass formula on arbitrary
    series and stays within [-1, 1] (Cauchy-Schwarz over the overlap)."""
    import datetime as dt

    from split_kinesis_streams_with_glue_spark.operators.timeseries import (
        autocorrelation,
    )

    mu = sum(xs) / len(xs)
    den = sum((x - mu) ** 2 for x in xs)
    if den == 0:
        return  # constant series: acf undefined (0/0), nothing to check
    days = [
        (dt.date(2024, 1, 1) + dt.timedelta(days=i), float(x))
        for i, x in enumerate(xs)
    ]
    df = spark.createDataFrame(days, "day date, x double")
    got = {
        r["lag"]: r["acf"] for r in autocorrelation(df, "day", "x", max_lag=3).collect()
    }
    for k in (1, 2, 3):
        want = sum((xs[i] - mu) * (xs[i + k] - mu) for i in range(len(xs) - k)) / den
        assert abs(got[k] - round(want, 6)) < 1e-4
        assert -1.000001 <= got[k] <= 1.000001


@SET
@given(
    st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=4,
        max_size=12,
    )
)
def test_theil_sen_matches_naive_median_of_slopes(spark, xs):
    import statistics

    from split_kinesis_streams_with_glue_spark.operators.timeseries import (
        theil_sen_slope,
    )

    pts = [(float(i), float(x)) for i, x in enumerate(xs)]
    df = spark.createDataFrame(pts, "t double, x double")
    got = theil_sen_slope(df, "t", "x").collect()[0]
    slopes = [
        (xs[j] - xs[i]) / (j - i)
        for i in range(len(xs))
        for j in range(i + 1, len(xs))
    ]
    assert got["n_pairs"] == len(slopes)
    assert abs(got["slope"] - round(statistics.median(slopes), 6)) < 1e-6


@SET
@given(
    st.lists(
        st.floats(min_value=0.5, max_value=10_000, allow_nan=False),
        min_size=5,
        max_size=30,
    )
)
def test_winsorize_style_clip_bounds_benford_digits(spark, xs):
    """benford_first_digit on arbitrary positive floats: digits are 1-9,
    counts sum to the number of rows with |x| >= 1, and observed
    fractions sum to ~1."""
    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        benford_first_digit,
    )

    df = spark.createDataFrame([(float(x),) for x in xs], "x double")
    rows = benford_first_digit(df, "x").collect()
    assert all(1 <= r["digit"] <= 9 for r in rows)
    eligible = sum(1 for x in xs if abs(x) >= 1)
    assert sum(r["n"] for r in rows) == eligible
    if rows:
        assert abs(sum(r["obs_frac"] for r in rows) - 1.0) < 1e-4
        for r in rows:
            assert str(int(abs(min(xs))))[0]  # sanity: digits derivable
            assert r["n"] == sum(
                1 for x in xs if abs(x) >= 1 and str(int(abs(x)))[0] == str(r["digit"])
            )


@SET
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-100, max_value=100, allow_nan=False),
            st.floats(min_value=-100, max_value=100, allow_nan=False),
        ),
        min_size=3,
        max_size=12,
    )
)
def test_spearman_matches_naive_rank_pearson(spark, pts):
    """spearman_corr must equal Pearson over naive midranks computed in
    Python, and be exactly +/-1 on any strictly monotone map."""
    import math

    from split_kinesis_streams_with_glue_spark.operators.timeseries import (
        spearman_corr,
    )

    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in pts], "x double, y double"
    )
    got = spearman_corr(df, "x", "y").collect()[0]["spearman_rho"]

    def midranks(vals):
        out = []
        for v in vals:
            less = sum(1 for u in vals if u < v)
            ties = sum(1 for u in vals if u == v)
            out.append(less + (ties + 1) / 2)
        return out

    rx = midranks([x for x, _ in pts])
    ry = midranks([y for _, y in pts])
    n = len(pts)
    sx, sy = sum(rx), sum(ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    sxx = sum(a * a for a in rx)
    syy = sum(b * b for b in ry)
    vx, vy = n * sxx - sx * sx, n * syy - sy * sy
    if vx <= 0 or vy <= 0:
        assert got is None
    else:
        want = (n * sxy - sx * sy) / math.sqrt(vx * vy)
        assert abs(got - round(want, 6)) < 1e-6


@SET
@given(
    st.lists(
        st.floats(min_value=0, max_value=1000, allow_nan=False),
        min_size=2,
        max_size=12,
    )
)
def test_gini_lorenz_matches_naive_and_bounds(spark, vals):
    """gini_lorenz must match the naive sorted-rank formula and lie in
    [0, 1 - 1/n] for non-negative data (NULL when the total is 0)."""
    from split_kinesis_streams_with_glue_spark.operators.timeseries import (
        gini_lorenz,
    )

    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    got = gini_lorenz(df, "x").collect()[0]["gini"]
    n, tot = len(vals), sum(vals)
    if tot <= 0:
        assert got is None
        return
    sv = sorted(vals)
    want = 2 * sum((i + 1) * v for i, v in enumerate(sv)) / (n * tot) - (n + 1) / n
    assert abs(got - round(want, 6)) < 1e-6
    assert -1e-9 <= got <= 1 - 1 / n + 1e-9


@SET
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-50, max_value=50, allow_nan=False),
            st.booleans(),
        ),
        min_size=2,
        max_size=14,
    )
)
def test_mann_whitney_u_matches_naive(spark, rows):
    """mann_whitney_u's histogram-midrank U must equal the naive
    all-pairs count U = #(a>b) + 0.5*#(a==b), and lie in [0, na*nb]."""
    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        mann_whitney_u,
    )

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(float(v), bool(g)) for v, g in rows], "v double, g boolean"
    )
    got = mann_whitney_u(df, "v", F.col("g")).collect()[0]
    a = [v for v, g in rows if g]
    b = [v for v, g in rows if not g]
    if not a or not b:
        assert got["u_statistic"] is None
        return
    want = sum(
        1.0 if x > y else (0.5 if x == y else 0.0) for x in a for y in b
    )
    assert abs(got["u_statistic"] - round(want, 6)) < 1e-6
    assert -1e-9 <= got["u_statistic"] <= len(a) * len(b) + 1e-9


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),
            st.integers(min_value=1, max_value=5),
        ),
        min_size=1,
        max_size=10,
    )
)
@SET
def test_isotonic_fit_equals_sequential_pava(spark, pts):
    """The minimax-form distributed isotonic fit is pointwise equal to
    the sequential pool-adjacent-violators reference (exact Fraction
    arithmetic) for arbitrary short weighted integer series, and always
    monotone nondecreasing."""
    from split_kinesis_streams_with_glue_spark.operators.timeseries import (
        isotonic_fit,
    )
    from tests.test_extensions import _naive_pava

    rows = [(k, s, w) for k, (s, w) in enumerate(pts)]
    df = spark.createDataFrame(rows, "k int, num long, den long")
    got = {r["k"]: r["fit"] for r in isotonic_fit(df, "k", "num", "den").collect()}
    expect = _naive_pava([s for s, _ in pts], [w for _, w in pts])
    for k in range(len(pts)):
        assert abs(got[k] - float(expect[k])) < 1e-9
    fits = [got[k] for k in range(len(pts))]
    assert all(a <= b + 1e-12 for a, b in zip(fits, fits[1:]))


@SET
@given(
    st.lists(
        st.tuples(st.sampled_from("pq"), st.sampled_from("pq")),
        min_size=1,
        max_size=40,
    )
)
def test_cohens_kappa_matches_naive(spark, pairs):
    """Kappa must equal the textbook Counter computation on arbitrary
    2-category rater pairs, including the pe = 1 degenerate (NULL)."""
    from collections import Counter

    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        cohens_kappa,
    )

    df = spark.createDataFrame(pairs, "a string, b string")
    [r] = cohens_kappa(df, "a", "b").collect()
    n = len(pairs)
    agree = sum(1 for a, b in pairs if a == b)
    ma = Counter(a for a, _ in pairs)
    mb = Counter(b for _, b in pairs)
    pe = sum(ma[c] * mb[c] for c in ma) / n / n
    po = agree / n
    assert r["n"] == n
    assert abs(r["p_observed"] - po) < 1.1e-6
    assert abs(r["p_expected"] - pe) < 1.1e-6
    if pe < 1.0:
        assert abs(r["kappa"] - (po - pe) / (1 - pe)) < 1.1e-6
    else:
        assert r["kappa"] is None


@SET
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=6), st.integers(0, 1)),
        min_size=2,
        max_size=40,
    ).filter(lambda rows: len({x for x, _ in rows}) >= 2)
)
def test_info_gain_split_matches_naive_scan(spark, rows):
    """The stump must pick exactly the threshold a brute-force scan over
    every candidate picks (rounded-gain argmax, smaller value on ties),
    with the same gain."""
    import math

    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        info_gain_split,
    )

    def ent(p, n):
        if n == 0 or p == 0 or p == n:
            return 0.0
        a, b = p / n, (n - p) / n
        return -(a * math.log(a)) - (b * math.log(b))

    vals = sorted({x for x, _ in rows})
    nt, pt = len(rows), sum(y for _, y in rows)
    best = None
    for v in vals[:-1]:
        nl = sum(1 for x, _ in rows if x <= v)
        pl = sum(y for x, y in rows if x <= v)
        gain = round(
            ent(pt, nt)
            - (nl / nt) * ent(pl, nl)
            - ((nt - nl) / nt) * ent(pt - pl, nt - nl),
            6,
        )
        if best is None or gain > best[0]:
            best = (gain, v)
    df = spark.createDataFrame(rows, "x int, y int")
    [r] = info_gain_split(df, "x", "y").collect()
    assert r["threshold"] == float(best[1])
    assert abs(r["info_gain"] - best[0]) < 1.1e-6


@SET
@given(
    st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=15),
                st.floats(min_value=0, max_value=1, allow_nan=False),
            ),
            min_size=1,
            max_size=10,
            unique_by=lambda t: t[0],
        ),
        min_size=1,
        max_size=3,
    )
)
def test_rrf_fuse_matches_naive(spark, lists):
    """Fused order and scores must equal the by-hand reciprocal-rank sum
    on arbitrary candidate lists (rounded-score ranking, id tiebreaks)."""
    from split_kinesis_streams_with_glue_spark.operators.similarity import (
        rrf_fuse,
    )

    frames = [
        spark.createDataFrame(lst, "doc_id int, score double") for lst in lists
    ]
    got = rrf_fuse(frames, k0=60, k=50).collect()
    rrf: dict[int, float] = {}
    for lst in lists:
        ranked = sorted(lst, key=lambda t: (-round(t[1], 6), t[0]))
        for rank, (i, _) in enumerate(ranked, 1):
            rrf[i] = rrf.get(i, 0.0) + 1.0 / (60 + rank)
    want = sorted(rrf.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))
    assert [r["doc_id"] for r in got] == [i for i, _ in want]
    for r in got:
        assert abs(r["rrf_score"] - rrf[r["doc_id"]]) < 1.1e-6


@SET
@given(
    st.lists(
        st.lists(st.sampled_from(["aa", "b", "cde", "f"]), min_size=1, max_size=8),
        min_size=1,
        max_size=10,
    )
)
def test_good_turing_matches_counter(spark, docs):
    """All six Good-Turing statistics must equal the Counter computation
    on arbitrary corpora, including the hapax-free NULL discount."""
    from collections import Counter

    from split_kinesis_streams_with_glue_spark.operators.text import (
        good_turing_mass,
    )

    texts = [" ".join(ws) for ws in docs]
    counts = Counter(w for ws in docs for w in ws)
    n = sum(counts.values())
    n1 = sum(1 for c in counts.values() if c == 1)
    n2 = sum(1 for c in counts.values() if c == 2)
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    [r] = good_turing_mass(df).collect()
    assert r["total_tokens"] == n and r["vocab_size"] == len(counts)
    assert r["hapax_terms"] == n1 and r["dis_terms"] == n2
    assert abs(r["p_unseen"] - n1 / n) < 1.1e-6
    if n1 > 0:
        assert abs(r["r_star_1"] - 2 * n2 / n1) < 1.1e-6
    else:
        assert r["r_star_1"] is None


@SET
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=6), st.integers(0, 1)),
        min_size=1,
        max_size=30,
    )
)
def test_kaplan_meier_matches_naive_product_limit(spark, rows):
    """The product-limit curve must equal the textbook per-duration
    computation on arbitrary censoring patterns, including the exact
    zero-survival step (factor 1 - d/n == 0)."""
    import math

    from split_kinesis_streams_with_glue_spark.operators.timeseries import (
        kaplan_meier,
    )

    df = spark.createDataFrame(rows, "dur int, ev int")
    got = {r["t"]: r for r in kaplan_meier(df, "dur", "ev").collect()}
    ts = sorted({d for d, _ in rows})
    ls, zero = 0.0, False
    for t in ts:
        n = sum(1 for d, _ in rows if d >= t)
        d_t = sum(e for d, e in rows if d == t)
        if n == d_t:
            zero = True
        elif d_t > 0:
            ls += math.log(1 - d_t / n)
        r = got[t]
        assert r["n_at_risk"] == n and r["n_events"] == d_t
        want = 0.0 if zero else math.exp(ls)
        assert abs(r["survival"] - want) < 1.1e-6
    assert set(got) == set(ts)


@SET
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-4, max_value=4, allow_nan=False, width=32),
            min_size=3,
            max_size=3,
        ),
        min_size=2,
        max_size=8,
    ).filter(lambda vs: len({tuple(v) for v in vs}) >= 2)
)
def test_pca_power_iteration_matches_naive_unrolled(spark, vecs):
    """The distributed fixed-count power iteration must equal the same
    six unrolled rounds run in plain Python on the same covariance —
    the operator is a deterministic dataflow, not an approximation with
    its own convergence story."""
    import math

    from hypothesis import assume

    from split_kinesis_streams_with_glue_spark.operators.similarity import (
        top_principal_component,
    )

    n, d = len(vecs), 3
    sx = [sum(v[p] for v in vecs) for p in range(d)]
    cov = [
        [
            sum(v[a] * v[b] for v in vecs) / n - (sx[a] / n) * (sx[b] / n)
            for b in range(d)
        ]
        for a in range(d)
    ]
    v = [0.125] * d
    for _ in range(6):
        w = [sum(cov[a][b] * v[b] for b in range(d)) for a in range(d)]
        nm = math.sqrt(sum(x * x for x in w))
        assume(nm > 1e-6)  # rank-degenerate input: normalization blows up
        v = [x / nm for x in w]
    w = [sum(cov[a][b] * v[b] for b in range(d)) for a in range(d)]
    lam = sum(v[a] * w[a] for a in range(d))
    tr = sum(cov[a][a] for a in range(d))
    df = spark.createDataFrame(
        [(i, list(map(float, vv))) for i, vv in enumerate(vecs)],
        "vec_id int, embedding array<float>",
    )
    got = {r["pos"]: r for r in top_principal_component(df).collect()}
    for p in range(d):
        assert abs(got[p]["loading"] - v[p]) < 1e-4
        assert abs(got[p]["eigenvalue"] - lam) < 1e-4
        assert abs(got[p]["explained_share"] - lam / tr) < 1e-4


@SET
@given(
    st.lists(
        st.lists(
            st.floats(min_value=-2, max_value=2, allow_nan=False, width=32),
            min_size=3,
            max_size=3,
        ),
        min_size=2,
        max_size=7,
    )
)
def test_mmr_select_matches_naive_greedy(spark, vecs):
    """The unrolled MMR dataflow must pick exactly what the sequential
    greedy picks on arbitrary vectors (rounded-score argmax, id
    tiebreaks), relevance and penalty both via the left-fold dot."""
    from pyspark.sql import functions as F

    from split_kinesis_streams_with_glue_spark.operators.similarity import (
        mmr_select,
    )

    q = vecs[0]
    cands = list(enumerate(vecs[1:], start=1))
    k = min(3, len(cands))

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    sel: list[int] = []
    want: list[int] = []
    for _ in range(k):
        best = None
        for i, v in cands:
            if i in sel:
                continue
            pen = max((dot(v, vecs[j]) for j in sel), default=None)
            score = 0.5 * dot(v, q) - (0.5 * pen if pen is not None else 0.0)
            key = (-round(score, 6), i)
            if best is None or key < best[0]:
                best = (key, i)
        sel.append(best[1])
        want.append(best[1])
    df = spark.createDataFrame(
        [(0, list(map(float, q)))]
        + [(i, list(map(float, v))) for i, v in cands],
        "vec_id int, embedding array<float>",
    )
    got = mmr_select(
        df.filter(F.col("vec_id") != 0), df.filter(F.col("vec_id") == 0), k=k
    ).collect()
    assert [r["vec_id"] for r in sorted(got, key=lambda r: r["step"])] == want


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),
            st.integers(min_value=1, max_value=20),
        ),
        min_size=1,
        max_size=25,
    ),
    st.sampled_from([(1, 2), (1, 4), (3, 4), (9, 10)]),
)
def test_weighted_quantile_matches_naive_cumsum(spark, rows, q):
    """The bin-refinement weighted quantile must equal the sorted
    cumulative-weight scan: smallest v with cumweight(x <= v) >=
    ceil(q*W)."""
    from split_kinesis_streams_with_glue_spark.operators.profile import (
        weighted_quantile,
    )

    qn, qd = q
    total = sum(w for _, w in rows)
    tt = (qn * total + qd - 1) // qd
    acc = 0
    want = None
    for v, w in sorted(rows):
        acc += w
        if acc >= tt:
            want = float(v)
            break
    df = spark.createDataFrame(rows, "x int, w int")
    got = weighted_quantile(df, "x", "w", qn, qd)
    assert got == want


@SET
@given(
    st.lists(
        st.integers(min_value=0, max_value=1000),
        min_size=1,
        max_size=20,
    )
)
def test_benjamini_hochberg_matches_naive_step_up(spark, milli_ps):
    """The distributed BH pass must select exactly the step-up set the
    sequential scan selects (largest rank k with p_(k) <= k*alpha/m;
    HALF_UP critical-value rounding mirrored via decimal)."""
    from decimal import ROUND_HALF_UP, Decimal

    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        benjamini_hochberg,
    )

    ps = [m / 1000 for m in milli_ps]
    m = len(ps)
    ranked = sorted(enumerate(ps), key=lambda t: (t[1], t[0]))
    kstar = 0
    for rank, (_, p) in enumerate(ranked, 1):
        crit = float(
            (Decimal(rank) / (Decimal(10) * Decimal(m))).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )
        if p <= crit:
            kstar = rank
    want = {i for rank, (i, _) in enumerate(ranked, 1) if rank <= kstar}
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(ps)], "hid int, p double"
    )
    got = {
        r["hid"]
        for r in benjamini_hochberg(df, "p", "hid").collect()
        if r["selected"]
    }
    assert got == want


@SET
@given(
    st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
        min_size=1,
        max_size=60,
    ),
    st.sampled_from([0.1, 0.25, 0.5, 0.9, 1.0]),
)
def test_exact_quantile_twopass_matches_sorted_order_statistic(spark, xs, q):
    """The iterative bin-refinement quantile must return EXACTLY the
    k-th smallest (k = ceil(q*n)) of the sorted list on arbitrary
    floats — with rank_limit/n_bins forced tiny so the test exercises
    several refinement passes (duplicates, negative ranges, equal-value
    short-circuit), not just the final ranking."""
    import math

    from split_kinesis_streams_with_glue_spark.operators.profile import (
        exact_quantile_twopass,
    )

    df = spark.createDataFrame([(float(x),) for x in xs], "x double")
    [r] = exact_quantile_twopass(
        df, "x", q, n_bins=4, rank_limit=3
    ).collect()
    k = max(1, math.ceil(q * len(xs)))
    want = sorted(float(x) for x in xs)[k - 1]
    assert r["n"] == len(xs)
    assert r["value"] == want


@SET
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=4), st.integers(0, 1)),
        min_size=1,
        max_size=40,
    )
)
def test_cochran_armitage_matches_naive_formula(spark, rows):
    """The single-fold trend statistic must equal the textbook
    T/sqrt(Var) computation on arbitrary (score, success) tables,
    NULL exactly when Var = 0 (no/all successes or one group)."""
    import math

    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        cochran_armitage_trend,
    )

    df = spark.createDataFrame(rows, "s int, ok int")
    [r] = cochran_armitage_trend(df, "s", "ok").collect()
    n = len(rows)
    tr = sum(ok for _, ok in rows)
    groups = sorted({s for s, _ in rows})
    sr = sum(s * ok for s, ok in rows)
    sn = sum(s for s, _ in rows)
    ssn = sum(s * s for s, _ in rows)
    t_stat = sr - tr * sn / n
    var = (tr / n) * (1 - tr / n) * (ssn - sn * sn / n)
    assert r["n_rows"] == n and r["n_success"] == tr
    assert r["n_groups"] == len(groups)
    if var > 0:
        assert abs(r["z"] - t_stat / math.sqrt(var)) < 1.1e-6
    else:
        assert r["z"] is None and r["p_value"] is None


@SET
@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=2, max_size=20),
    st.lists(st.integers(min_value=0, max_value=50), min_size=2, max_size=20),
)
def test_wasserstein_matches_naive_transport(spark, xs, ys):
    """The gap-weighted ECDF fold must equal the textbook transport form:
    for empirical distributions, W1 = integral |Fa - Fb| computed here by
    a dense per-unit scan over the merged support."""
    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        wasserstein_1d,
    )

    rows = [("a", v) for v in xs] + [("b", v) for v in ys]
    df = spark.createDataFrame(rows, "g string, v int")
    [r] = wasserstein_1d(df, "v", "g", "a", "b").collect()

    lo, hi = min(xs + ys), max(xs + ys)
    na, nb = len(xs), len(ys)
    want = 0.0
    for t in range(lo, hi):  # unit steps: n_chars-like integer support
        fa = sum(1 for v in xs if v <= t) / na
        fb = sum(1 for v in ys if v <= t) / nb
        want += abs(fa - fb)
    assert abs(r["w1_distance"] - round(want, 6)) < 1e-5


@SET
@given(
    st.lists(
        st.tuples(st.integers(0, 1000), st.booleans()),
        min_size=2,
        max_size=25,
        unique_by=lambda t: t[0],
    ).filter(lambda l: any(r for _, r in l))
)
def test_average_precision_matches_naive_loop(spark, items):
    """AP from the windowed cumulative fold must equal the literal loop
    over the sorted ranking."""
    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        average_precision,
    )

    df = spark.createDataFrame(
        [(i, float(s), int(r)) for i, (s, r) in enumerate(items)],
        "id int, score double, rel int",
    )
    [got] = average_precision(df, "score", "rel", "id", k=3).collect()

    ranked = sorted(
        enumerate(items), key=lambda t: (-round(t[1][0], 6), t[0])
    )
    n_rel = sum(1 for _, (_, r) in ranked if r)
    cum, ap, p3 = 0, 0.0, 0
    for rank, (_, (_, r)) in enumerate(ranked, 1):
        if r:
            cum += 1
            ap += cum / rank
        if rank <= 3 and r:
            p3 += 1
    assert got["n_rel"] == n_rel
    assert abs(got["average_precision"] - round(ap / n_rel, 6)) < 1e-6
    assert abs(got["p_at_k"] - round(p3 / 3.0, 6)) < 1e-6


@SET
@given(
    st.lists(st.integers(0, 100), min_size=2, max_size=15),
    st.lists(st.integers(0, 100), min_size=2, max_size=15),
)
def test_welch_matches_statistics_module(spark, xs, ys):
    """t and the Satterthwaite df must match the naive mean/variance
    computation (guarded to non-degenerate variances)."""
    import statistics

    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        welch_ttest,
    )

    if statistics.variance(xs) == 0 or statistics.variance(ys) == 0:
        return
    rows = [("a", v) for v in xs] + [("b", v) for v in ys]
    df = spark.createDataFrame(rows, "g string, v int")
    [r] = welch_ttest(df, "v", "g", "a", "b").collect()
    na, nb = len(xs), len(ys)
    sea = statistics.variance(xs) / na
    seb = statistics.variance(ys) / nb
    t = (statistics.mean(xs) - statistics.mean(ys)) / (sea + seb) ** 0.5
    dfw = (sea + seb) ** 2 / (sea**2 / (na - 1) + seb**2 / (nb - 1))
    assert abs(r["t_stat"] - round(t, 6)) < 1e-4
    assert abs(r["welch_df"] - round(dfw, 6)) < 1e-3


@SET
@given(st.lists(st.integers(0, 30), min_size=2, max_size=15))
def test_changepoint_matches_brute_force(spark, xs):
    """The cumulative-sum argmax must pick the same split (and gain) as
    the O(n^2) brute-force SSE evaluation, tiebreaking on the earlier
    split."""
    from split_kinesis_streams_with_glue_spark.operators.timeseries import (
        changepoint_mean,
    )

    df = spark.createDataFrame(list(enumerate(xs)), "t int, x int")
    [r] = changepoint_mean(df, "t", "x").collect()

    n = len(xs)
    best = None
    for cut in range(1, n):  # split after index cut-1
        left, right = xs[:cut], xs[cut:]
        ml = sum(left) / len(left)
        mr = sum(right) / len(right)
        gain = round(len(left) * len(right) / n * (ml - mr) ** 2, 6)
        if best is None or gain > best[0]:
            best = (gain, cut - 1, ml, mr)
    assert r["split_t"] == best[1]
    assert abs(r["sse_gain"] - best[0]) < 1e-6


@SET
@given(
    st.lists(
        st.tuples(st.integers(1, 20), st.integers(0, 20)),
        min_size=2,
        max_size=10,
    ).filter(lambda l: all(k <= n for n, k in l))
)
def test_eb_shrinkage_matches_fraction_arithmetic(spark, groups):
    """Method-of-moments prior and posterior means must match exact
    Fraction arithmetic (cast to float only at the comparison)."""
    from fractions import Fraction

    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        eb_beta_binomial,
    )

    rows = []
    for gi, (n, k) in enumerate(groups):
        rows += [(f"g{gi}", 1)] * k + [(f"g{gi}", 0)] * (n - k)
    df = spark.createDataFrame(rows, "g string, f int")
    got = {r["group"]: r for r in eb_beta_binomial(df, "g", "f").collect()}

    rates = [Fraction(k, n) for n, k in groups]
    m = sum(rates) / len(rates)
    v = sum((r - m) ** 2 for r in rates) / len(rates)
    if v == 0:
        assert all(got[f"g{i}"]["shrunk_rate"] is None for i in range(len(groups)))
        return
    s = m * (1 - m) / v - 1
    for gi, (n, k) in enumerate(groups):
        row = got[f"g{gi}"]
        assert abs(row["raw_rate"] - round(float(Fraction(k, n)), 6)) < 1e-9
        if s <= 0:
            assert row["shrunk_rate"] is None
        else:
            want = float((k + m * s) / (n + s))
            assert abs(row["shrunk_rate"] - round(want, 6)) < 1e-5


@SET
@given(
    st.lists(
        st.lists(st.floats(-3, 3, allow_nan=False, width=32), min_size=3, max_size=3),
        min_size=4,
        max_size=12,
    ),
    st.lists(
        st.lists(st.floats(-3, 3, allow_nan=False, width=32), min_size=3, max_size=3),
        min_size=4,
        max_size=12,
    ),
)
def test_mmd_linear_matches_naive(spark, xs, ys):
    """The distributed consecutive-pair fold must equal the literal
    Python computation of Gretton's linear estimator (same pairing, same
    RBF kernel, float32 inputs widened to double exactly as Spark does)."""
    import math
    import struct

    from split_kinesis_streams_with_glue_spark.operators.similarity import (
        mmd_linear,
    )

    def f32(v):  # mirror the array<float> storage precision
        return struct.unpack("f", struct.pack("f", v))[0]

    xs = [[f32(v) for v in row] for row in xs]
    ys = [[f32(v) for v in row] for row in ys]
    rows = [("x", i, v) for i, v in enumerate(xs)] + [
        ("y", 100 + i, v) for i, v in enumerate(ys)
    ]
    df = spark.createDataFrame(
        rows, "g string, vec_id int, embedding array<float>"
    )
    [r] = mmd_linear(df, "g", "x", "y").collect()

    def rbf(a, b):
        d2 = sum(u * u for u in a) + sum(u * u for u in b) - 2 * sum(
            u * w for u, w in zip(a, b)
        )
        return math.exp(-d2 / 2.0)

    m = min(len(xs) // 2, len(ys) // 2)
    hs = [
        rbf(xs[2 * i], xs[2 * i + 1])
        + rbf(ys[2 * i], ys[2 * i + 1])
        - rbf(xs[2 * i], ys[2 * i + 1])
        - rbf(xs[2 * i + 1], ys[2 * i])
        for i in range(m)
    ]
    assert r["n_pairs"] == m
    assert abs(r["mmd2_linear"] - round(sum(hs) / m, 6)) < 1e-5


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),
            st.lists(st.floats(-5, 5, allow_nan=False, width=32), min_size=2, max_size=2),
        ),
        min_size=4,
        max_size=14,
    ).filter(lambda l: len({lbl for lbl, _ in l}) >= 2)
)
def test_silhouette_matches_naive_centroid_form(spark, pts):
    """Per-cluster mean simplified silhouette must match the literal
    centroid computation."""
    import math
    import struct

    from split_kinesis_streams_with_glue_spark.operators.similarity import (
        silhouette_simplified,
    )

    def f32(v):
        return struct.unpack("f", struct.pack("f", v))[0]

    pts = [(lbl, [f32(a) for a in vec]) for lbl, vec in pts]
    df = spark.createDataFrame(
        [(i, vec, lbl) for i, (lbl, vec) in enumerate(pts)],
        "vec_id int, embedding array<float>, label int",
    )
    got = {r["label"]: r for r in silhouette_simplified(df).collect()}

    labels = sorted({lbl for lbl, _ in pts})
    cents = {}
    for lbl in labels:
        members = [vec for l2, vec in pts if l2 == lbl]
        cents[lbl] = [sum(col) / len(members) for col in zip(*members)]

    def dist(a, b):
        return math.sqrt(
            max(
                sum(u * u for u in a)
                + sum(u * u for u in b)
                - 2 * sum(u * w for u, w in zip(a, b)),
                0.0,
            )
        )

    sums = {lbl: [0.0, 0] for lbl in labels}
    for lbl, vec in pts:
        a = dist(vec, cents[lbl])
        b = min(dist(vec, cents[o]) for o in labels if o != lbl)
        if max(a, b) == 0:
            continue  # coincident centroids: engine emits NULL-ish 0/0
        sums[lbl][0] += (b - a) / max(a, b)
        sums[lbl][1] += 1
    for lbl in labels:
        if sums[lbl][1] and got[lbl]["mean_silhouette"] is not None:
            want = sums[lbl][0] / sums[lbl][1]
            assert abs(got[lbl]["mean_silhouette"] - round(want, 6)) < 1e-4


@SET
@given(st.text(alphabet="ab c", min_size=1, max_size=120), st.integers(1, 4))
def test_hill_matches_counter_reference(spark, text, k):
    """Hill estimator from the Spark histogram fold must equal the
    Counter-based reference on the same tokenization."""
    import math
    from collections import Counter

    from split_kinesis_streams_with_glue_spark.operators.text import (
        hill_tail_index,
    )

    df = spark.createDataFrame([(text,)], "text string")
    [r] = hill_tail_index(df, k=k).collect()
    counts = Counter(w for w in text.lower().split() if w)
    ordered = sorted(counts.items(), key=lambda t: (-t[1], t[0]))
    if len(ordered) <= k:
        assert r["x_tail"] is None
        return
    xk1 = ordered[k][1]
    gamma = sum(math.log(c / xk1) for _, c in ordered[:k]) / k
    assert r["x_tail"] == xk1
    assert abs(r["hill_gamma"] - round(gamma, 6)) < 1e-6
    if gamma > 0:
        assert abs(r["hill_alpha"] - round(1 / gamma, 6)) < 1e-4
    else:
        assert r["hill_alpha"] is None


@SET
@given(
    st.lists(st.text(alphabet="ab c", min_size=0, max_size=60), min_size=1, max_size=6),
    st.integers(2, 5),
)
def test_segmental_ttr_matches_loop(spark, texts, seg):
    """MSTTR from the posexplode aggregate must equal the literal
    per-document segmentation loop (full segments only)."""
    from split_kinesis_streams_with_glue_spark.operators.text import (
        segmental_ttr,
    )

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id int, text string")
    [r] = segmental_ttr(df, segment_len=seg).collect()

    ttrs, docs = [], set()
    all_tokens = []
    for i, t in enumerate(texts):
        toks = [w for w in t.lower().split() if w]
        all_tokens += toks
        for s in range(len(toks) // seg):
            chunk = toks[s * seg : (s + 1) * seg]
            ttrs.append(len(set(chunk)) / seg)
            docs.add(i)
    assert r["n_segments"] == len(ttrs)
    assert r["n_docs"] == len(docs)
    if ttrs:
        assert abs(r["msttr"] - round(sum(ttrs) / len(ttrs), 6)) < 1e-6
    else:
        assert r["msttr"] is None
    if all_tokens:
        assert abs(r["raw_ttr"] - round(len(set(all_tokens)) / len(all_tokens), 6)) < 1e-9
    else:
        assert r["raw_ttr"] is None


@SET
@given(
    st.lists(st.text(alphabet="abcd", min_size=0, max_size=6), min_size=2, max_size=15),
    st.integers(1, 4),
)
def test_sorted_neighborhood_matches_naive_sort(spark, keys, window):
    """The two-pass range rank + offset-explode join must emit exactly
    the pairs a literal sorted scan emits, for any key multiset and any
    window."""
    from pyspark.sql import functions as F

    from split_kinesis_streams_with_glue_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    df = spark.createDataFrame(
        list(enumerate(keys)), "doc_id int, key string"
    )
    got = {
        (r["id_a"], r["id_b"], r["offset"])
        for r in sorted_neighborhood_pairs(df, F.col("key"), window=window).collect()
    }
    order = sorted(range(len(keys)), key=lambda i: (keys[i], i))
    want = {
        (order[i], order[i + off], off)
        for i in range(len(order))
        for off in range(1, window + 1)
        if i + off < len(order)
    }
    assert got == want


@SET
@given(
    st.lists(
        st.tuples(st.text(alphabet="xyz", min_size=1, max_size=4), st.integers(1, 9)),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    )
)
def test_horvitz_thompson_matches_python_hash_sim(spark, rows):
    """The engine's inclusion decisions and estimator must match a
    literal Python simulation of the same md5-derived uniforms."""
    import hashlib

    from split_kinesis_streams_with_glue_spark.operators.sampling import (
        horvitz_thompson_total,
    )

    df = spark.createDataFrame(rows, "text string, y int")
    [r] = horvitz_thompson_total(
        df, "y", "y", sampling_fraction_num=1, sampling_fraction_den=2
    ).collect()

    from decimal import Decimal

    mw = sum(y for _, y in rows) / len(rows)
    ht = var = Decimal(0)  # the operator sums 6-dp-rounded DECIMAL terms
    n_sampled = 0
    for text, y in rows:
        u48 = int(hashlib.md5(text.encode()).hexdigest()[:12], 16)
        u = u48 / float(1 << 48)
        pi = min(1.0, (1.0 / 2.0) * y / mw)
        if u < pi:
            n_sampled += 1
            ht += Decimal(str(round(y / pi, 6)))
            var += Decimal(str(round((1.0 - pi) / (pi * pi) * y * y, 6)))
    assert r["n_sampled"] == n_sampled
    if n_sampled:
        assert abs(r["ht_total"] - float(ht)) < 2e-6
        assert abs(r["ht_variance"] - float(var)) < 2e-4


@SET
@given(
    st.lists(
        st.tuples(st.integers(1, 100), st.integers(0, 10)),
        min_size=1,
        max_size=8,
    ),
    st.integers(1, 300),
)
def test_token_budget_fill_matches_greedy(spark, groups, budget):
    """The windowed allocation must equal the sequential greedy fill
    (quality desc, group-name tiebreak)."""
    from split_kinesis_streams_with_glue_spark.operators.sampling import (
        token_budget_fill,
    )

    rows = []
    pergroup = {}
    for gi, (tok, q10) in enumerate(groups):
        g = f"g{gi}"
        rows.append((g, tok, q10 / 10.0))
        pergroup[g] = (tok, round(q10 / 10.0, 6))
    df = spark.createDataFrame(rows, "g string, tok int, q double")
    got = {r["group"]: r for r in token_budget_fill(df, "g", "tok", "q", budget).collect()}

    remaining = budget
    want = {}
    for g, (tok, q) in sorted(pergroup.items(), key=lambda t: (-t[1][1], t[0])):
        take = min(tok, max(remaining, 0))
        remaining -= tok
        if take > 0:
            want[g] = take
    assert {g: r["take_tokens"] for g, r in got.items()} == want
    for g, r in got.items():
        assert abs(r["take_fraction"] - round(want[g] / pergroup[g][0], 6)) < 1e-9


@SET
@given(
    st.lists(
        st.tuples(st.integers(0, 100), st.integers(0, 3)),
        min_size=1,
        max_size=20,
    ).filter(lambda l: any(r for _, r in l)),
    st.integers(1, 8),
)
def test_ndcg_matches_naive_loop(spark, items, k):
    """DCG/IDCG/nDCG from the two windowed folds must equal the literal
    sorted-loop computation."""
    import math

    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        ndcg_at_k,
    )

    df = spark.createDataFrame(
        [(i, float(s), r) for i, (s, r) in enumerate(items)],
        "id int, score double, rel int",
    )
    [got] = ndcg_at_k(df, "rel", "score", "id", k=k).collect()

    by_score = sorted(enumerate(items), key=lambda t: (-round(t[1][0], 6), t[0]))
    by_rel = sorted(enumerate(items), key=lambda t: (-t[1][1], t[0]))
    dcg = sum(
        (2.0 ** r - 1.0) / math.log2(rank + 1.0)
        for rank, (_, (_, r)) in enumerate(by_score[:k], 1)
    )
    idcg = sum(
        (2.0 ** r - 1.0) / math.log2(rank + 1.0)
        for rank, (_, (_, r)) in enumerate(by_rel[:k], 1)
    )
    assert abs(got["dcg"] - round(dcg, 6)) < 1e-6
    assert abs(got["idcg"] - round(idcg, 6)) < 1e-6
    assert abs(got["ndcg"] - round(dcg / idcg, 6)) < 1e-4


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(0, 5), st.integers(0, 5),
            st.integers(0, 5), st.integers(0, 5),
        ),
        min_size=1,
        max_size=6,
    ).filter(lambda l: any(sum(t) > 0 for t in l))
)
def test_mantel_haenszel_matches_fractions(spark, tables):
    """OR_MH and the crude OR must match exact Fraction arithmetic over
    arbitrary per-stratum 2x2 tables."""
    from fractions import Fraction

    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        mantel_haenszel_or,
    )

    rows = []
    for si, (a, b, c, d) in enumerate(tables):
        s = f"s{si}"
        rows += [(s, 1, 1)] * a + [(s, 1, 0)] * b
        rows += [(s, 0, 1)] * c + [(s, 0, 0)] * d
    df = spark.createDataFrame(rows, "s string, e int, o int")
    [r] = mantel_haenszel_or(df, "s", "e", "o").collect()

    live = [t for t in tables if sum(t) > 0]
    assert r["n_strata"] == len(live)
    sad = sum(Fraction(a * d, a + b + c + d) for a, b, c, d in live)
    sbc = sum(Fraction(b * c, a + b + c + d) for a, b, c, d in live)
    if sbc > 0:
        assert abs(r["or_mh"] - round(float(sad / sbc), 6)) < 1e-5
    else:
        assert r["or_mh"] is None
    ta = sum(a for a, _, _, _ in live)
    tb = sum(b for _, b, _, _ in live)
    tc = sum(c for _, _, c, _ in live)
    td = sum(d for _, _, _, d in live)
    if tb * tc > 0:
        assert abs(r["or_crude"] - round(ta * td / (tb * tc), 6)) < 1e-6
    else:
        assert r["or_crude"] is None


@SET
@given(
    st.sets(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(lambda t: t[0] != t[1]),
        min_size=0,
        max_size=12,
    ),
    st.sets(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(lambda t: t[0] != t[1]),
        min_size=0,
        max_size=12,
    ),
)
def test_blocking_metrics_matches_set_arithmetic(spark, cand, truth):
    """PC/RR must match plain SET arithmetic over orientation-normalized
    pairs, for arbitrary candidate and truth pair frames — including
    frames carrying BOTH orientations of the same pair, which the
    round-9 dedup fix collapses (join multiplicity used to double-count
    and pair_completeness could exceed 1.0)."""
    from split_kinesis_streams_with_glue_spark.operators.dedup import (
        blocking_metrics,
    )

    cand_rows = list(cand) or [(0, 1)]
    truth_rows = list(truth)
    cdf = spark.createDataFrame(cand_rows, "id_a int, id_b int")
    if truth_rows:
        tdf = spark.createDataFrame(truth_rows, "d1 int, d2 int")
    else:
        tdf = spark.createDataFrame([], "d1 int, d2 int")
    [r] = blocking_metrics(cdf, tdf, 10).collect()

    # PC/RR are SET metrics: normalization can merge (a,b)/(b,a) into
    # one pair, and the operator deduplicates both frames before
    # counting — the naive model is set intersection, never join
    # multiplicity
    cn = {(min(a, b), max(a, b)) for a, b in cand_rows}
    tn = {(min(a, b), max(a, b)) for a, b in truth_rows}
    hits = len(cn & tn)
    assert r["n_candidates"] == len(cn)
    assert r["n_true"] == len(tn)
    assert r["n_hit"] == hits
    if tn:
        assert abs(r["pair_completeness"] - round(hits / len(tn), 6)) < 1e-9
        assert r["pair_completeness"] <= 1.0
    else:
        assert r["pair_completeness"] is None
    assert abs(r["reduction_ratio"] - round(1 - len(cn) / 45.0, 6)) < 1e-9


@SET
@given(st.lists(st.integers(0, 8), min_size=3, max_size=14))
def test_mann_kendall_matches_naive_formula(spark, xs):
    """S, the tie-corrected variance, and the continuity-corrected z must
    match the textbook computation."""
    import math
    from collections import Counter

    from split_kinesis_streams_with_glue_spark.operators.timeseries import (
        mann_kendall,
    )

    df = spark.createDataFrame(list(enumerate(xs)), "t int, x int")
    [r] = mann_kendall(df, "t", "x").collect()

    n = len(xs)
    s = sum(
        (xs[j] > xs[i]) - (xs[j] < xs[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties = Counter(xs).values()
    var = (
        n * (n - 1) * (2 * n + 5)
        - sum(t * (t - 1) * (2 * t + 5) for t in ties)
    ) / 18.0
    assert r["s_statistic"] == s
    if var > 0:
        z = (s - (1 if s > 0 else -1 if s < 0 else 0)) / math.sqrt(var)
        if s == 0:
            z = 0.0
        assert abs(r["z_score"] - round(z, 6)) < 1e-6
    else:
        assert r["z_score"] is None


@SET
@given(
    st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6)),
        min_size=3,
        max_size=12,
    )
)
def test_kendall_tau_b_matches_naive_pairs(spark, pts):
    """C, D, and the tie-corrected tau-b must match the literal all-pairs
    scan."""
    import math
    from collections import Counter

    from split_kinesis_streams_with_glue_spark.operators.timeseries import (
        kendall_tau_b,
    )

    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)],
        "t int, x double, y double",
    )
    [r] = kendall_tau_b(df, "x", "y", "t").collect()

    n = len(pts)
    c = d = 0
    for i in range(n):
        for j in range(i + 1, n):
            sx = (pts[j][0] > pts[i][0]) - (pts[j][0] < pts[i][0])
            sy = (pts[j][1] > pts[i][1]) - (pts[j][1] < pts[i][1])
            if sx * sy > 0:
                c += 1
            elif sx * sy < 0:
                d += 1
    n0 = n * (n - 1) // 2
    tx = sum(t * (t - 1) // 2 for t in Counter(x for x, _ in pts).values())
    ty = sum(t * (t - 1) // 2 for t in Counter(y for _, y in pts).values())
    assert r["n_concordant"] == c and r["n_discordant"] == d
    if (n0 - tx) > 0 and (n0 - ty) > 0:
        tau = (c - d) / math.sqrt(float((n0 - tx) * (n0 - ty)))
        assert abs(r["tau_b"] - round(tau, 6)) < 1e-6
    else:
        assert r["tau_b"] is None


@SET
@given(st.lists(st.integers(-20, 20), min_size=1, max_size=14))
def test_hodges_lehmann_matches_naive_walsh_median(spark, xs):
    """The pseudo-median must equal the plain median of all Walsh
    averages (x_i + x_j)/2, i <= j."""
    import statistics

    from split_kinesis_streams_with_glue_spark.operators.timeseries import (
        hodges_lehmann,
    )

    df = spark.createDataFrame(list(enumerate(xs)), "t int, x int")
    [r] = hodges_lehmann(df, "x", "t").collect()
    walsh = [
        (xs[i] + xs[j]) / 2.0
        for i in range(len(xs))
        for j in range(i, len(xs))
    ]
    assert r["n_pairs"] == len(walsh)
    assert abs(r["hl_estimate"] - round(statistics.median(walsh), 6)) < 1e-6


@SET
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 6)),
        min_size=4,
        max_size=20,
    ).filter(lambda l: len({g for g, _ in l}) >= 2)
)
def test_kruskal_wallis_matches_naive_midranks(spark, rows):
    """The tie-corrected H must match the textbook midrank computation."""
    from collections import Counter

    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        kruskal_wallis_h,
    )

    df = spark.createDataFrame(
        [(f"g{g}", v) for g, v in rows], "g string, v int"
    )
    [r] = kruskal_wallis_h(df, "v", "g").collect()

    vals = sorted(v for _, v in rows)
    n = len(vals)
    # midrank per distinct value
    midrank = {}
    pos = 0
    for v, cnt in sorted(Counter(vals).items()):
        midrank[v] = pos + (cnt + 1) / 2.0
        pos += cnt
    groups = {}
    for g, v in rows:
        groups.setdefault(g, []).append(midrank[v])
    h = 12.0 / (n * (n + 1)) * sum(
        sum(rs) ** 2 / len(rs) for rs in groups.values()
    ) - 3 * (n + 1)
    tie_den = n**3 - n
    corr = 1.0 - sum(
        t**3 - t for t in Counter(vals).values()
    ) / tie_den if tie_den else 0.0
    assert r["dof"] == len(groups) - 1
    if corr > 0:
        assert abs(r["h_statistic"] - round(h / corr, 6)) < 1e-4
    else:
        assert r["h_statistic"] is None


@SET
@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.booleans()),
        min_size=2,
        max_size=20,
    )
)
def test_auc_rank_matches_pairwise_definition(spark, rows):
    """The rank-sum AUC must equal the literal pairwise probability:
    (#(pos > neg) + 0.5*#(pos == neg)) / (n_pos * n_neg), ties and all."""
    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        auc_rank,
    )

    df = spark.createDataFrame(
        [(s, int(y)) for s, y in rows], "s int, y int"
    )
    [r] = auc_rank(df, "s", "y").collect()
    pos = [s for s, y in rows if y]
    neg = [s for s, y in rows if not y]
    if not pos or not neg:
        assert r["auc"] is None
        return
    naive = sum(
        1.0 if p > q else (0.5 if p == q else 0.0) for p in pos for q in neg
    ) / (len(pos) * len(neg))
    assert abs(r["auc"] - round(naive, 6)) < 1e-9


@SET
@given(
    st.lists(
        st.tuples(st.sampled_from("abc"), st.sampled_from("xyz")),
        min_size=2,
        max_size=30,
    )
)
def test_cramers_v_matches_dense_contingency(spark, rows):
    """The sparse zero-cell-corrected chi2 must equal the dense-table
    Pearson chi2 (all r*c cells), and V must be its normalized root."""
    import math
    from collections import Counter

    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        cramers_v,
    )

    df = spark.createDataFrame(rows, "u string, w string")
    [r] = cramers_v(df, "u", "w").collect()
    n = len(rows)
    ra = Counter(u for u, _ in rows)
    rb = Counter(w for _, w in rows)
    joint = Counter(rows)
    chi2 = sum(
        (joint.get((a, b), 0) - ra[a] * rb[b] / n) ** 2 / (ra[a] * rb[b] / n)
        for a in ra
        for b in rb
    )
    assert abs(r["chi2"] - round(chi2, 6)) < 1e-4
    kmin = min(len(ra) - 1, len(rb) - 1)
    if kmin > 0:
        assert abs(r["v"] - round(math.sqrt(chi2 / n / kmin), 6)) < 1e-4
    else:
        assert r["v"] is None


@SET
@given(
    st.lists(
        st.tuples(st.integers(0, 6), st.floats(0, 1, allow_nan=False)),
        min_size=1,
        max_size=25,
    )
)
def test_pareto_skyline_matches_dominance_definition(spark, pts):
    """The prefix-max skyline must equal the literal quadratic strict-
    dominance filter on arbitrary point sets (duplicates included)."""
    from split_kinesis_streams_with_glue_spark.operators.profile import (
        pareto_skyline,
    )

    pts = [(x, round(y, 3)) for x, y in pts]
    df = spark.createDataFrame(pts, "x int, y double")
    got = sorted((r["x"], r["y"]) for r in pareto_skyline(df, "x", "y").collect())
    naive = sorted(
        a
        for a in pts
        if not any(
            b[0] >= a[0] and b[1] >= a[1] and (b[0] > a[0] or b[1] > a[1])
            for b in pts
        )
    )
    assert got == naive


@SET
@given(
    st.lists(st.lists(_words, min_size=0, max_size=8), min_size=1, max_size=6)
)
def test_kneser_ney_matches_naive(spark, docs):
    """P_KN from the operator must equal the literal Chen-Goodman
    formula computed with Python Counters over the same bigrams."""
    from collections import Counter

    from split_kinesis_streams_with_glue_spark.operators.text import (
        kneser_ney_bigram,
    )

    texts = [" ".join(d) for d in docs]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        (r["w1"], r["w2"]): (r["c12"], r["pkn"])
        for r in kneser_ney_bigram(df, k=1000).collect()
    }
    bc = Counter()
    for d in docs:
        for a, b in zip(d, d[1:]):
            bc[(a, b)] += 1
    if not bc:
        assert got == {}
        return
    c1 = Counter()
    nf = Counter()
    nb = Counter()
    for (a, b), c in bc.items():
        c1[a] += c
        nf[a] += 1
        nb[b] += 1
    T = len(bc)
    for (a, b), c in bc.items():
        pkn = max(c - 0.75, 0.0) / c1[a] + ((0.75 * nf[a]) / c1[a]) * (
            nb[b] / T
        )
        gc, gp = got[(a, b)]
        assert gc == c
        assert abs(gp - round(pkn, 6)) < 1e-9


@SET
@given(
    st.lists(
        st.tuples(st.sampled_from("pq"), st.integers(0, 50)),
        min_size=2,
        max_size=24,
    )
)
def test_quantile_normalize_matches_naive(spark, rows):
    """The rank mapping must equal the literal per-group formula over
    Python-sorted lists: idx = 1 + (r-1)(N-1)//(n-1), singleton ->
    global median index."""
    from split_kinesis_streams_with_glue_spark.operators.sampling import (
        quantile_normalize,
    )

    data = [(i, g, v) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id int, g string, v int")
    got = {
        r["doc_id"]: r["norm_v"]
        for r in quantile_normalize(df, "v", "g").collect()
    }
    glob = sorted((v, i) for i, g, v in data)
    N = len(glob)
    want = {}
    for grp in {g for _, g, _ in data}:
        members = sorted((v, i) for i, g, v in data if g == grp)
        n = len(members)
        for r, (v, i) in enumerate(members, 1):
            idx = (r - 1) * (N - 1) // (n - 1) + 1 if n > 1 else (N + 1) // 2
            want[i] = glob[idx - 1][0]
    assert got == want


@SET
@given(
    st.lists(
        st.lists(
            st.floats(-4, 4, allow_nan=False, width=32),
            min_size=3,
            max_size=3,
        ),
        min_size=2,
        max_size=10,
        unique_by=tuple,
    )
)
def test_lightweight_coreset_matches_naive(spark, vecs):
    """Selection and weights must equal the literal Bachem-Lucic-Krause
    procedure with the same md5 priorities on arbitrary vectors."""
    import hashlib

    from split_kinesis_streams_with_glue_spark.operators.sampling import (
        lightweight_coreset,
    )

    data = [(i + 1, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(data, "vec_id long, embedding array<float>")
    import struct as _struct

    f32 = lambda x: _struct.unpack("f", _struct.pack("f", x))[0]
    data32 = [(i, [f32(x) for x in v]) for i, v in data]
    m = 2
    got = lightweight_coreset(df, m=m).collect()
    n = len(data32)
    mean = [
        sum(round(v[j], 6) for _, v in data32) / n for j in range(3)
    ]
    d2 = {
        i: round(sum((x - mu) ** 2 for x, mu in zip(v, mean)), 6)
        for i, v in data32
    }
    sd2 = round(sum(d2.values()), 10)
    q = {
        i: (0.5 / n + (0.5 * d2[i]) / sd2) if sd2 > 0 else 1.0 / n
        for i, _ in data32
    }

    def prio(i):
        u48 = int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16)
        return q[i] * float(1 << 48) / (u48 + 1)

    expect = sorted(data32, key=lambda t: (-prio(t[0]), t[0]))[:m]
    assert [r["vec_id"] for r in got] == [i for i, _ in expect]
    for r in got:
        assert abs(r["q_prob"] - round(q[r["vec_id"]], 6)) < 2e-6


@SET
@given(
    st.lists(st.integers(-20, 20), min_size=1, max_size=10),
    st.lists(st.integers(-20, 20), min_size=1, max_size=10),
)
def test_sliced_wasserstein_equal_n_closed_form(spark, xs, ys):
    """With |A| = |B| = n the 1-D W1 equals the sorted-coupling mean
    (1/n) * sum |a_(i) - b_(i)|; check every slice against that closed
    form computed on the same rounded projections."""
    from split_kinesis_streams_with_glue_spark.operators.quantize import (
        projection_signs,
    )
    from split_kinesis_streams_with_glue_spark.operators.similarity import (
        sliced_wasserstein,
    )

    n = min(len(xs), len(ys))
    xs, ys = xs[:n], ys[:n]
    dim = 2
    rows = [([float(x), 1.0], 0) for x in xs] + [
        ([float(y), 1.0], 1) for y in ys
    ]
    df = spark.createDataFrame(rows, "embedding array<float>, label int")
    got = sliced_wasserstein(df, "label", 0, 1, n_slices=2, dim=dim).collect()
    signs = projection_signs(dim, 2)
    scale = 1.0 / (dim ** 0.5)
    for r in got:
        s = signs[r["slice_id"]]
        pa = sorted(round((x * s[0] + 1.0 * s[1]) * scale, 6) for x in xs)
        pb = sorted(round((y * s[0] + 1.0 * s[1]) * scale, 6) for y in ys)
        w1 = sum(abs(a - b) for a, b in zip(pa, pb)) / n
        assert abs(r["w1_distance"] - w1) < 1e-5


@SET
@given(
    st.lists(
        st.tuples(
            st.floats(0, 1, allow_nan=False).map(lambda x: round(x, 2)),
            st.booleans(),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_brier_decomposition_identity(spark, rows):
    """Murphy's identity is exact under distinct-value grouping: the
    decomposed Brier must equal the direct mean (p - y)^2."""
    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        brier_decomposition,
    )

    df = spark.createDataFrame(
        [(p, int(y)) for p, y in rows], "p double, y int"
    )
    [r] = brier_decomposition(df, "p", "y").collect()
    direct = sum((p - y) ** 2 for p, y in rows) / len(rows)
    assert abs(r["brier"] - direct) < 1e-5
    assert r["uncertainty"] is not None and r["reliability"] >= 0
    assert r["resolution"] >= 0


@SET
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 3)),
        min_size=2,
        max_size=20,
    )
)
def test_adjusted_rand_index_matches_naive(spark, labels):
    """The contingency-fold ARI must equal the literal Hubert-Arabie
    pair-counting formula computed with Counters."""
    from collections import Counter

    from split_kinesis_streams_with_glue_spark.operators.graph import (
        adjusted_rand_index,
    )

    rows_a = [(i, f"a{la}") for i, (la, _) in enumerate(labels)]
    rows_b = [(i, f"b{lb}") for i, (_, lb) in enumerate(labels)]
    a = spark.createDataFrame(rows_a, "doc_id int, cluster_id string")
    b = spark.createDataFrame(rows_b, "doc_id int, cluster_id string")
    [r] = adjusted_rand_index(a, b).collect()

    comb2 = lambda x: x * (x - 1) // 2
    cont = Counter(labels)
    ix = sum(comb2(v) for v in cont.values())
    ea = sum(comb2(v) for v in Counter(la for la, _ in labels).values())
    eb = sum(comb2(v) for v in Counter(lb for _, lb in labels).values())
    n = len(labels)
    m = n * (n - 1) / 2.0
    expd = ea * eb / m
    maxd = (ea + eb) / 2.0
    assert r["index_pairs"] == float(ix)
    if maxd - expd == 0:
        assert r["ari"] is None
    else:
        assert abs(r["ari"] - round((ix - expd) / (maxd - expd), 6)) < 1e-9


@SET
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=-50, max_value=50),
        ),
        min_size=6,
        max_size=24,
    )
)
def test_brown_forsythe_matches_naive_levene_median(spark, rows):
    """The operator must equal the literal Brown-Forsythe recipe: group
    LOWER medians, z=|x-med|, one-way ANOVA F on the z's."""
    from collections import defaultdict

    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        brown_forsythe,
    )

    df = spark.createDataFrame(
        [(g, float(x)) for g, x in rows], "g string, x double"
    )
    [r] = brown_forsythe(df, "x", "g").collect()
    by = defaultdict(list)
    for g, x in rows:
        by[g].append(float(x))
    zs = {}
    for g, xs in by.items():
        med = sorted(xs)[(len(xs) + 1) // 2 - 1]
        zs[g] = [abs(x - med) for x in xs]
    n = sum(len(v) for v in zs.values())
    k = len(zs)
    zbar = sum(sum(v) for v in zs.values()) / n
    ssb = sum(len(v) * (sum(v) / len(v) - zbar) ** 2 for v in zs.values())
    ssw = sum(
        sum((z - sum(v) / len(v)) ** 2 for z in v) for v in zs.values()
    )
    assert r["n"] == n and r["n_groups"] == k
    assert abs(r["ss_between"] - ssb) < 1e-5
    assert abs(r["ss_within"] - ssw) < 1e-5
    if k >= 2 and n > k and ssw > 1e-12:
        want = (ssb / (k - 1)) / (ssw / (n - k))
        assert abs(r["f_stat"] - want) < 1e-4


@SET
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]), st.sampled_from(["p", "q"])
        ),
        min_size=2,
        max_size=30,
    )
)
def test_theil_u_matches_naive_entropies(spark, rows):
    """U(X|Y) must equal (H(X)+H(Y)-H(X,Y))/H(X) computed by literal
    plogp sums over the Counter contingency."""
    import math
    from collections import Counter

    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        theil_u,
    )

    df = spark.createDataFrame(rows, "x string, y string")
    [r] = theil_u(df, "x", "y").collect()
    n = len(rows)

    def ent(counts):
        return -sum(c / n * math.log(c / n) for c in counts)

    hx = ent(Counter(x for x, _ in rows).values())
    hy = ent(Counter(y for _, y in rows).values())
    hxy = ent(Counter(rows).values())
    mi = hx + hy - hxy
    assert r["n"] == n
    assert abs(r["h_x"] - hx) < 1e-5 and abs(r["h_joint"] - hxy) < 1e-5
    assert abs(r["mutual_info"] - mi) < 1e-5
    if hx > 1e-9:
        assert abs(r["u_x_given_y"] - mi / hx) < 1e-4
    else:
        assert r["u_x_given_y"] is None


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),
            st.integers(min_value=0, max_value=1),
        ),
        min_size=4,
        max_size=40,
    )
)
def test_cochran_armitage_matches_naive_trend(spark, rows):
    """z^2 must equal the literal Cochran-Armitage trend chi-square
    computed from the 2xk Counter table."""
    from collections import Counter

    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        cochran_armitage,
    )

    df = spark.createDataFrame(rows, "s int, y int")
    [r] = cochran_armitage(df, "s", "y").collect()
    nk = Counter(s for s, _ in rows)
    rk = Counter(s for s, y in rows if y == 1)
    n = len(rows)
    R = sum(rk.values())
    s1 = sum(s * c for s, c in nk.items())
    s2 = sum(s * s * c for s, c in nk.items())
    t = sum(s * c for s, c in rk.items())
    num = t - R / n * s1
    var = (R / n) * (1 - R / n) * (s2 - s1 * s1 / n)
    assert r["n"] == n and r["n_pos"] == R and r["n_levels"] == len(nk)
    if var > 1e-12:
        assert abs(r["chi2_trend"] - num * num / var) < 1e-4
    else:
        assert r["chi2_trend"] is None


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.lists(
                st.integers(min_value=-8, max_value=8),
                min_size=2,
                max_size=2,
            ),
        ),
        min_size=4,
        max_size=16,
    )
)
def test_calinski_harabasz_matches_naive(spark, rows):
    """CH must equal the literal between/within dispersion ratio over
    the raw points."""
    from collections import defaultdict

    from split_kinesis_streams_with_glue_spark.operators.similarity import (
        calinski_harabasz,
    )

    df = spark.createDataFrame(
        [(str(l), [float(a), float(b)]) for l, (a, b) in rows],
        "label string, embedding array<float>",
    )
    [r] = calinski_harabasz(df, "embedding", "label").collect()
    by = defaultdict(list)
    for l, v in rows:
        by[str(l)].append([float(x) for x in v])
    n, k = len(rows), len(by)
    cg = [
        sum(v[d] for vs in by.values() for v in vs) / n for d in range(2)
    ]
    B = W = 0.0
    for vs in by.values():
        c = [sum(v[d] for v in vs) / len(vs) for d in range(2)]
        B += len(vs) * sum((c[d] - cg[d]) ** 2 for d in range(2))
        W += sum(sum((v[d] - c[d]) ** 2 for d in range(2)) for v in vs)
    assert r["n"] == n and r["n_clusters"] == k
    assert abs(r["ss_between"] - B) < 1e-5
    assert abs(r["ss_within"] - W) < 1e-5
    if k >= 2 and n > k and W > 1e-9:
        want = (B / (k - 1)) / (W / (n - k))
        assert abs(r["ch_index"] - want) < 1e-3


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),
            st.integers(min_value=0, max_value=40),
        ),
        min_size=3,
        max_size=12,
    )
)
def test_cross_correlation_matches_naive_pearson(spark, vals):
    """ccf(l) must equal the literal Pearson r over the lag-l overlap
    for every lag in -2..2."""
    import datetime as dt
    import math

    from split_kinesis_streams_with_glue_spark.operators.timeseries import (
        cross_correlation,
    )

    d0 = dt.date(2024, 1, 1)
    rows = [
        (d0 + dt.timedelta(days=i), x, y) for i, (x, y) in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "day date, x long, y long")
    got = {
        r["lag"]: r
        for r in cross_correlation(df, "day", "x", "y", 2).collect()
    }
    m = len(vals)
    for lag in range(-2, 3):
        pairs = [
            (vals[i][0], vals[i + lag][1])
            for i in range(m)
            if 0 <= i + lag < m
        ]
        if not pairs:
            assert lag not in got
            continue
        n = len(pairs)
        sx = sum(p[0] for p in pairs)
        sy = sum(p[1] for p in pairs)
        sxy = sum(p[0] * p[1] for p in pairs)
        sxx = sum(p[0] ** 2 for p in pairs)
        syy = sum(p[1] ** 2 for p in pairs)
        vx, vy = n * sxx - sx * sx, n * syy - sy * sy
        assert got[lag]["n_days"] == n
        if vx > 0 and vy > 0:
            want = (n * sxy - sx * sy) / math.sqrt(vx * vy)
            assert abs(got[lag]["ccf"] - want) < 1e-5
        else:
            assert got[lag]["ccf"] is None


@SET
@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=20)
)
def test_haar_energy_matches_naive_dyadic(spark, vals):
    """Level energies must equal the literal zero-padded dyadic
    half-block differences."""
    import datetime as dt

    from split_kinesis_streams_with_glue_spark.operators.timeseries import (
        haar_energy,
    )

    d0 = dt.date(2024, 1, 1)
    rows = [(d0 + dt.timedelta(days=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "day date, x long")
    got = {r["level"]: r for r in haar_energy(df, "day", "x", 3).collect()}
    for level in (1, 2, 3):
        size = 1 << level
        half = size >> 1
        n_blocks = (len(vals) + size - 1) // size
        want = 0.0
        for p in range(n_blocks):
            blk = vals[p * size : (p + 1) * size]
            blk = blk + [0] * (size - len(blk))
            d = sum(blk[:half]) - sum(blk[half:])
            want += d * d / size
        assert got[level]["n_blocks"] == n_blocks
        assert abs(got[level]["energy"] - want) < 1e-6


@SET
@given(
    st.integers(min_value=1, max_value=30),
    st.integers(min_value=1, max_value=30),
)
def test_systematic_sample_matches_naive_rule(spark, n, m):
    """For any N and m <= N: exactly m rows, and exactly the ranks the
    literal floor-increment rule selects."""
    from split_kinesis_streams_with_glue_spark.operators.sampling import (
        systematic_sample,
    )

    m = min(m, n)
    df = spark.createDataFrame(
        [(i, (i * 7) % 13) for i in range(n)], "doc_id long, score long"
    )
    got = sorted(
        (r["score"], r["doc_id"])
        for r in systematic_sample(df, m, "score", "doc_id").collect()
    )
    ordered = sorted(((i * 7) % 13, i) for i in range(n))
    want = [
        ordered[r - 1]
        for r in range(1, n + 1)
        if (r * m) // n > ((r - 1) * m) // n
    ]
    assert len(got) == m
    assert got == want


@SET
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 5)),
        min_size=2,
        max_size=30,
    )
)
def test_jonckheere_matches_pairwise_definition(spark, rows):
    """J-T must equal the literal pairwise count (2 per strict rise, 1
    per tie across ordered group pairs), and z must match the
    tie-corrected Hollander-Wolfe moments computed independently."""
    import math

    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        jonckheere_terpstra,
    )

    df = spark.createDataFrame(rows, "g int, v int")
    [r] = jonckheere_terpstra(df, "g", "v").collect()

    j2 = sum(
        2 if vi < vj else 1
        for gi, vi in rows
        for gj, vj in rows
        if gi < gj and vi <= vj
    )
    assert r["j_times2"] == str(j2)
    n = len(rows)
    groups = {}
    ties = {}
    for g, v in rows:
        groups[g] = groups.get(g, 0) + 1
        ties[v] = ties.get(v, 0) + 1
    k = len(groups)
    s2 = sum(c * c for c in groups.values())
    mean2 = (n * n - s2) / 2.0
    g25 = sum(c * (c - 1) * (2 * c + 5) for c in groups.values())
    g3 = sum(c * (c - 1) * (c - 2) for c in groups.values())
    g2 = sum(c * (c - 1) for c in groups.values())
    t25 = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    t3 = sum(t * (t - 1) * (t - 2) for t in ties.values())
    t2 = sum(t * (t - 1) for t in ties.values())
    var = (n * (n - 1) * (2 * n + 5) - g25 - t25) / 72.0
    if n > 2:
        var += g3 * t3 / (36.0 * n * (n - 1) * (n - 2))
        var += g2 * t2 / (8.0 * n * (n - 1))
    if k < 2 or n <= 2 or var <= 0:
        assert r["z_score"] is None
    else:
        z = (j2 - mean2) / (2.0 * math.sqrt(var))
        assert abs(r["z_score"] - round(z, 6)) < 1e-9


@SET
@given(st.lists(st.integers(0, 6), min_size=1, max_size=25))
def test_runs_test_matches_naive_count(spark, xs):
    """Runs/sign counts must equal the literal day-order recount against
    the lower median, and z the closed-form moments."""
    import math

    from split_kinesis_streams_with_glue_spark.operators.timeseries import (
        runs_test,
    )

    df = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(xs)], "d int, x double"
    )
    [r] = runs_test(df, "d", "x").collect()

    n_all = len(xs)
    med = sorted(xs)[(n_all + 1) // 2 - 1]
    signs = [x > med for x in xs if x != med]
    runs = sum(
        1 for i, s in enumerate(signs) if i == 0 or s != signs[i - 1]
    )
    n1 = sum(signs)
    n2 = len(signs) - n1
    assert (r["n_pos"], r["n_neg"], r["runs"]) == (n1, n2, runs)
    if n1 == 0 or n2 == 0:
        assert r["z_score"] is None
    else:
        nn = float(n1 + n2)
        two = 2.0 * n1 * n2
        var = two * (two - nn) / (nn * nn * (nn - 1.0))
        z = (runs - (two / nn + 1.0)) / math.sqrt(var)
        assert abs(r["z_score"] - round(z, 6)) < 1e-9


@SET
@given(st.lists(st.integers(0, 4), min_size=3, max_size=25))
def test_permutation_entropy_matches_naive(spark, xs):
    """Pattern histogram and entropy must equal the literal
    order-of-appearance-tie recount."""
    import math
    from collections import Counter

    from split_kinesis_streams_with_glue_spark.operators.timeseries import (
        permutation_entropy,
    )

    df = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(xs)], "d int, x double"
    )
    [r] = permutation_entropy(df, "d", "x").collect()

    pats = Counter()
    for i in range(len(xs) - 2):
        tri = xs[i : i + 3]
        ranks = [
            sum(1 for j, o in enumerate(tri) if o < v or (o == v and j < k))
            for k, v in enumerate(tri)
        ]
        pats[tuple(ranks)] += 1
    nw = sum(pats.values())
    assert r["n_windows"] == nw and r["n_patterns"] == len(pats)
    h = sum(round(-(c / nw) * math.log(c / nw), 9) for c in pats.values())
    assert abs(r["perm_entropy"] - round(h, 6)) < 1e-9
    assert abs(r["perm_entropy_norm"] - round(h / math.log(6.0), 6)) < 1e-9


@SET
@given(st.lists(st.integers(0, 5), min_size=2, max_size=20))
def test_ljung_box_matches_naive(spark, xs):
    """Q must equal the literal acf recomputation over consecutive days
    with the operator's exact quantization (6-dp acf, 9-dp terms)."""
    import datetime as dt

    from split_kinesis_streams_with_glue_spark.operators.timeseries import (
        ljung_box,
    )

    days = [dt.date(2024, 1, 1) + dt.timedelta(days=i) for i in range(len(xs))]
    df = spark.createDataFrame(
        list(zip(days, [float(x) for x in xs])), "d date, x double"
    )
    L = 3
    [r] = ljung_box(df, "d", "x", max_lag=L).collect()

    n = len(xs)
    mu = sum(xs) / n
    c = [x - mu for x in xs]
    den = sum(v * v for v in c)
    terms = []
    for k in range(1, L + 1):
        num = sum(c[t] * c[t + k] for t in range(n - k))
        if n - k <= 0:
            continue  # no pairs at this lag
        if den != 0:
            rk = round(num / den, 6)
            if k < n:
                terms.append(round(rk * rk / (n - k), 9))
    assert r["n"] == n and r["lags_used"] == len(terms)
    if terms and n > 1:
        q = round(n * (n + 2.0) * sum(terms), 6)
        assert abs(r["q_stat"] - q) < 1e-9
    else:
        assert r["q_stat"] is None


@SET
@given(
    st.lists(
        st.tuples(st.booleans(), st.booleans()), min_size=1, max_size=30
    )
)
def test_mcnemar_matches_naive(spark, rows):
    """Discordant counts and both chi-squares equal the literal recount."""
    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        mcnemar,
    )

    df = spark.createDataFrame(rows, "a boolean, b boolean")
    [r] = mcnemar(df, "a", "b").collect()
    b = sum(1 for a, bb in rows if a and not bb)
    c = sum(1 for a, bb in rows if bb and not a)
    assert (r["n_discordant_ab"], r["n_discordant_ba"]) == (b, c)
    if b + c == 0:
        assert r["chi2"] is None
    else:
        assert abs(r["chi2"] - round((b - c) ** 2 / (b + c), 6)) < 1e-9
        corr = max(abs(b - c) - 1.0, 0.0)
        assert abs(
            r["chi2_corrected"] - round(corr * corr / (b + c), 6)
        ) < 1e-9


def test_burrows_delta_identical_sources_have_zero_delta(spark):
    """Two sources sharing the exact text must sit at Delta 0 of each
    other while both sit strictly above 0 from a different third."""
    from split_kinesis_streams_with_glue_spark.operators.text import (
        burrows_delta,
    )

    df = spark.createDataFrame(
        [
            ("s1", "alpha beta beta gamma"),
            ("s2", "alpha beta beta gamma"),
            ("s3", "gamma gamma delta delta alpha"),
        ],
        "source string, text string",
    )
    rows = {
        (r["group_a"], r["group_b"]): r["delta"]
        for r in burrows_delta(df, "text", "source", m=4).collect()
    }
    assert rows[("s1", "s2")] == 0.0
    assert rows[("s1", "s3")] > 0.0 and rows[("s2", "s3")] > 0.0
    assert rows[("s1", "s3")] == rows[("s2", "s3")]


@SET
@given(
    st.lists(
        st.tuples(st.booleans(), st.integers(0, 5)),
        min_size=4,
        max_size=25,
    )
)
def test_jonckheere_at_k2_is_mann_whitney(spark, rows):
    """The docstring's pinned invariant: with two ordered groups, J-T IS
    Mann-Whitney — the z from jonckheere_terpstra(g in {0,1}) must match
    mann_whitney_u(split = g)'s tie-corrected normal approximation (both
    unrounded quantities are algebraically identical; 6-dp rounding can
    split them by at most one ulp of the last digit)."""
    from pyspark.sql import functions as F

    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        jonckheere_terpstra,
        mann_whitney_u,
    )

    df = spark.createDataFrame(
        [(int(g), v) for g, v in rows], "g int, v int"
    )
    [jt] = jonckheere_terpstra(df, "g", "v").collect()
    [mw] = mann_whitney_u(df, "v", F.col("g") == 1).collect()
    if jt["n_groups"] < 2:
        return  # one-sided draw: MW z is NULL too, nothing to compare
    if jt["z_score"] is None:
        assert mw["z_score"] is None
    else:
        assert abs(jt["z_score"] - mw["z_score"]) <= 1.1e-6


@SET
@given(st.lists(st.integers(0, 9), min_size=16, max_size=80))
def test_hurst_rs_matches_naive(spark, xs):
    """The fitted H must equal a literal pure-Python R/S recomputation
    with the operator's exact quantization (9-dp decimal folds for the
    per-block variance, per-scale mean, and OLS terms)."""
    import math

    from split_kinesis_streams_with_glue_spark.operators.timeseries import (
        hurst_rs,
    )

    df = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(xs)], "d int, x double"
    )
    [r] = hurst_rs(df, "d", "x", min_scale=4, n_scales=3).collect()

    n = len(xs)
    pts = []
    for j in range(3):
        s = 4 * (2**j)
        if n // s < 2:
            continue
        rs_terms = []
        for b in range(n // s):
            block = xs[b * s : (b + 1) * s]
            m = sum(block) / s
            cum, c, lo, hi = 0.0, [], None, None
            for v in block:
                cum += v - m
                lo = cum if lo is None else min(lo, cum)
                hi = cum if hi is None else max(hi, cum)
            rng = hi - lo
            sd = math.sqrt(
                sum(round((v - m) * (v - m), 9) for v in block) / s
            )
            if sd > 0:
                rs_terms.append(round(rng / sd, 9))
        if rs_terms:
            avg = round(sum(rs_terms) / len(rs_terms), 9)
            pts.append((math.log(s), math.log(avg)))
    assert r["n"] == n and r["scales_used"] == len(pts)
    if len(pts) < 2:
        assert r["hurst_exponent"] is None
        return
    k = len(pts)
    sx = sum(round(x, 9) for x, _ in pts)
    sy = sum(round(y, 9) for _, y in pts)
    sxy = sum(round(x * y, 9) for x, y in pts)
    sxx = sum(round(x * x, 9) for x, _ in pts)
    den = k * sxx - sx * sx
    if den == 0:
        assert r["hurst_exponent"] is None
    else:
        assert abs(
            r["hurst_exponent"] - round((k * sxy - sx * sy) / den, 6)
        ) < 2e-6


@SET
@given(st.lists(st.integers(0, 9), min_size=4, max_size=20))
def test_aov_periodogram_matches_naive_anova(spark, xs):
    """eta2/F must equal the literal one-way-ANOVA recount over the
    phase folding, with the operator's exact quantization (9-dp
    rounded S^2/n terms)."""
    from split_kinesis_streams_with_glue_spark.operators.timeseries import (
        aov_periodogram,
    )

    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "d int, x int"
    )
    rows = {
        r["period"]: r for r in aov_periodogram(df, "d", "x", 2, 4).collect()
    }
    n = len(xs)
    s = sum(xs)
    ss = sum(x * x for x in xs)
    for p in (2, 3, 4):
        phases = {}
        for i, x in enumerate(xs):
            phases.setdefault(i % p, []).append(x)
        k = len(phases)
        bsum = sum(
            round(sum(v) ** 2 / len(v), 9) for v in phases.values()
        )
        ss_t = ss - s * s / n
        ss_b = bsum - s * s / n
        r = rows[p]
        assert r["n_phases"] == k and r["n_days"] == n
        if ss_t > 0:
            assert abs(r["eta2"] - round(ss_b / ss_t, 6)) < 1e-9
        else:
            assert r["eta2"] is None
        if ss_t > 0 and (ss_t - ss_b) > 0 and k > 1 and n > k:
            f = (ss_b / (k - 1)) / ((ss_t - ss_b) / (n - k))
            assert abs(r["f_stat"] - round(f, 6)) < 1e-9
        else:
            assert r["f_stat"] is None


@SET
@given(st.lists(st.integers(0, 9), min_size=1, max_size=25))
def test_cusum_changepoint_matches_naive_bridge(spark, xs):
    """The argmax day, the exact-integer bridge, and the normalized
    statistic must equal the literal recount."""
    import math

    from split_kinesis_streams_with_glue_spark.operators.timeseries import (
        cusum_changepoint,
    )

    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "d int, x int"
    )
    [r] = cusum_changepoint(df, "d", "x").collect()
    n = len(xs)
    s = sum(xs)
    ss = sum(x * x for x in xs)
    pref = 0
    best = (-1, None, None)  # (abs bridge, t, prefix) with earliest-t tie
    for t, x in enumerate(xs, start=1):
        pref += x
        ab = abs(n * pref - t * s)
        if ab > best[0]:
            best = (ab, t, pref)
    ab, t_star, pref_star = best
    assert r["n_days"] == n and r["change_index"] == t_star
    var_num = n * ss - s * s
    if var_num > 0:
        assert abs(
            r["cusum_stat"] - round(ab / math.sqrt(n * var_num), 6)
        ) < 1e-9
    else:
        assert r["cusum_stat"] is None
    assert abs(r["mean_before"] - round(pref_star / t_star, 6)) < 1e-9
    if n > t_star:
        assert abs(
            r["mean_after"] - round((s - pref_star) / (n - t_star), 6)
        ) < 1e-9
    else:
        assert r["mean_after"] is None


@SET
@given(
    st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)),
        min_size=1,
        max_size=20,
    ),
    st.integers(1, 3),
)
def test_k_core_matches_naive_peel(spark, raw, k):
    """The survivors and their in-core degrees must equal the literal
    sequential fixpoint peel on the same graph."""
    from split_kinesis_streams_with_glue_spark.operators.graph import k_core

    edges = sorted({(min(a, b), max(a, b)) for a, b in raw if a != b})
    if not edges:
        return
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    alive = set(adj)
    while True:
        nxt = {n for n in alive if len(adj[n] & alive) >= k}
        if nxt == alive:
            break
        alive = nxt
    df = spark.createDataFrame(edges, "d1 int, d2 int")
    got = {
        r["node"]: r["core_degree"]
        for r in k_core(df, k=k, max_rounds=10).collect()
    }
    assert got == {n: len(adj[n] & alive) for n in alive}


@SET
@given(
    st.lists(st.integers(0, 15), min_size=1, max_size=10, unique=True),
    st.lists(st.integers(0, 15), min_size=1, max_size=10, unique=True),
)
def test_rank_agreement_matches_naive(spark, ids_a, ids_b):
    """Jaccard, footrule, and tau-a must equal the literal recount over
    two ranked lists (rank = 1-based list position)."""
    from split_kinesis_streams_with_glue_spark.operators.retrieval import (
        rank_agreement,
    )

    a = spark.createDataFrame(
        [(d, i + 1) for i, d in enumerate(ids_a)], "doc_id int, rank int"
    )
    b = spark.createDataFrame(
        [(d, i + 1) for i, d in enumerate(ids_b)], "doc_id int, rank int"
    )
    [r] = rank_agreement(a, b).collect()
    ra = {d: i + 1 for i, d in enumerate(ids_a)}
    rb = {d: i + 1 for i, d in enumerate(ids_b)}
    common = sorted(set(ra) & set(rb))
    m = len(common)
    assert (r["n_a"], r["n_b"], r["n_common"]) == (
        len(ids_a),
        len(ids_b),
        m,
    )
    assert abs(
        r["jaccard"]
        - round(m / (len(ids_a) + len(ids_b) - m), 6)
    ) < 1e-9
    if m > 0:
        disp = sum(abs(ra[d] - rb[d]) for d in common)
        assert abs(r["mean_rank_disp"] - round(disp / m, 6)) < 1e-9
    else:
        assert r["mean_rank_disp"] is None
    if m >= 2:
        conc = disc = 0
        for i in range(m):
            for j in range(i + 1, m):
                d1, d2 = common[i], common[j]
                prod = (ra[d1] - ra[d2]) * (rb[d1] - rb[d2])
                conc += prod > 0
                disc += prod < 0
        tau = (conc - disc) / (m * (m - 1) / 2)
        assert abs(r["kendall_tau"] - round(tau, 6)) < 1e-9
    else:
        assert r["kendall_tau"] is None


@SET
@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
            lambda t: t[0] != t[1]
        ),
        min_size=1,
        max_size=14,
    ),
    st.integers(1, 4),
)
def test_label_propagation_matches_naive(spark, raw_edges, rounds):
    """The operator must equal the literal synchronous simulation:
    every node simultaneously takes the plurality label of its
    neighbors (ties to the smallest label) for exactly `rounds`
    rounds, with an early stop only on a no-change round."""
    from collections import Counter

    from split_kinesis_streams_with_glue_spark.operators.graph import (
        label_propagation,
    )

    edges = {tuple(sorted(e)) for e in raw_edges}
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    labels = {n: n for n in adj}
    for _ in range(rounds):
        new = {}
        for n in adj:
            votes = Counter(labels[m] for m in adj[n])
            top = max(votes.values())
            new[n] = min(l for l, c in votes.items() if c == top)
        if new == labels:
            break
        labels = new
    df = spark.createDataFrame(sorted(edges), "d1 int, d2 int")
    got = {
        r["node"]: r["label"]
        for r in label_propagation(df, rounds=rounds).collect()
    }
    assert got == labels


@SET
@given(
    st.lists(st.integers(0, 15), min_size=1, max_size=8, unique=True),
    st.lists(st.integers(0, 15), min_size=1, max_size=8, unique=True),
)
def test_rbo_matches_naive(spark, ids_a, ids_b):
    """rbo_ext must equal the literal Webber-Moffat-Zobel fold with
    p = 1/2 over the per-depth prefix intersections (rank = 1-based
    list position; k = the longer list's length)."""
    from split_kinesis_streams_with_glue_spark.operators.retrieval import (
        rbo_overlap,
    )

    k = max(len(ids_a), len(ids_b))
    a = spark.createDataFrame(
        [(d, i + 1) for i, d in enumerate(ids_a)], "doc_id int, rank int"
    )
    b = spark.createDataFrame(
        [(d, i + 1) for i, d in enumerate(ids_b)], "doc_id int, rank int"
    )
    [r] = rbo_overlap(a, b, k=k).collect()
    xs = []
    for d in range(1, k + 1):
        xs.append(len(set(ids_a[:d]) & set(ids_b[:d])))
    want = (xs[-1] / k) * 0.5 ** k + sum(
        (x / d) * 0.5 ** d for d, x in enumerate(xs, 1)
    )
    assert r["n_common"] == xs[-1]
    assert abs(r["rbo_ext"] - want) < 2e-6


@SET
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),
            st.lists(st.integers(0, 20), min_size=1, max_size=6,
                     unique=True),
        ),
        min_size=1,
        max_size=3,
        unique_by=lambda t: t[0],
    ),
    st.lists(
        st.tuples(
            st.integers(0, 3),
            st.lists(st.integers(0, 20), min_size=1, max_size=4,
                     unique=True),
        ),
        min_size=1,
        max_size=4,
        unique_by=lambda t: t[0],
    ),
)
def test_multi_query_eval_matches_naive(spark, sys_lists, truth_lists):
    """MRR / precision@p / recall@k must equal the literal per-query
    recount macro-averaged over every query in the TRUTH panel."""
    from split_kinesis_streams_with_glue_spark.operators.retrieval import (
        multi_query_eval,
    )

    k, p_at = 6, 3
    sys_rows = [
        (f"q{q}", d, i + 1)
        for q, docs in sys_lists
        for i, d in enumerate(docs)
    ]
    truth_rows = [
        (f"q{q}", d) for q, docs in truth_lists for d in docs
    ]
    system = spark.createDataFrame(
        sys_rows, "query_id string, doc_id int, rank int"
    )
    truth = spark.createDataFrame(truth_rows, "query_id string, doc_id int")
    [r] = multi_query_eval(system, truth, k=k, p_at=p_at).collect()
    sysd = {f"q{q}": docs for q, docs in sys_lists}
    rrs, precs, recs = [], [], []
    for q, rel in truth_lists:
        qn, relset = f"q{q}", set(rel)
        ranked = sysd.get(qn, [])
        hit_ranks = [i + 1 for i, d in enumerate(ranked) if d in relset]
        rrs.append(1.0 / hit_ranks[0] if hit_ranks else 0.0)
        precs.append(len([h for h in hit_ranks if h <= p_at]) / p_at)
        recs.append(len(hit_ranks) / len(relset))
    nq = len(truth_lists)
    assert r["n_queries"] == nq
    assert abs(r["mrr"] - sum(rrs) / nq) < 2e-6
    assert abs(r["mean_precision"] - sum(precs) / nq) < 2e-6
    assert abs(r["mean_recall"] - sum(recs) / nq) < 2e-6


@SET
@given(st.lists(st.integers(-5, 5), min_size=2, max_size=12))
def test_pettitt_matches_naive(spark, values):
    """K, the argmax index (earliest on ties), and the p-exponent must
    equal the literal double-sum U_t = sum_{i<=t,j>t} sgn(x_i - x_j)
    recount."""
    import datetime as dt

    from split_kinesis_streams_with_glue_spark.operators.timeseries import (
        pettitt_changepoint,
    )

    n = len(values)
    days = [dt.date(2024, 1, 1) + dt.timedelta(days=i) for i in range(n)]
    df = spark.createDataFrame(
        list(zip(days, values)), "d date, x int"
    )
    [r] = pettitt_changepoint(df, "d", "x").collect()

    def sgn(a, b):
        return (a > b) - (a < b)

    us = []
    for t in range(1, n):
        us.append(
            sum(
                sgn(values[i], values[j])
                for i in range(t)
                for j in range(t, n)
            )
        )
    kstat = max(abs(u) for u in us)
    tbest = next(t for t, u in enumerate(us, 1) if abs(u) == kstat)
    assert r["k_stat"] == kstat
    assert r["change_index"] == tbest
    assert r["change_day"] == days[tbest - 1]
    assert r["u_signed"] == us[tbest - 1]
    want = 6.0 * kstat * kstat / (float(n) ** 3 + float(n) ** 2)
    assert abs(r["p_exponent"] - want) < 2e-6


@SET
@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9), st.integers(0, 9)),
        min_size=2,
        max_size=12,
    )
)
def test_cronbach_alpha_matches_naive(spark, rows):
    """alpha must equal the literal exact-fraction computation
    k/(k-1) * (1 - sum var_i / var_total) with population variances."""
    from fractions import Fraction

    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        cronbach_alpha,
    )

    df = spark.createDataFrame(rows, "x int, y int, z int")
    [r] = cronbach_alpha(df, ["x", "y", "z"]).collect()
    n = len(rows)
    cols = list(zip(*rows))
    totals = [sum(t) for t in rows]

    def var_num(vals):
        return n * sum(v * v for v in vals) - sum(vals) ** 2

    tot_num = var_num(totals)
    if tot_num == 0:
        assert r["alpha"] is None
    else:
        share = Fraction(sum(var_num(c) for c in cols), tot_num)
        want = Fraction(3, 2) * (1 - share)
        assert abs(r["alpha"] - float(want)) < 2e-6


@SET
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 9)),
        min_size=2,
        max_size=16,
    )
)
def test_mood_median_matches_naive(spark, rows):
    """Cell counts, the median band, and chi2 must equal the literal
    recount: band = the two middle order statistics, strictly-outside
    classification, (O-E)^2/E over used groups."""
    from split_kinesis_streams_with_glue_spark.operators.quality_checks import (
        mood_median,
    )

    df = spark.createDataFrame(
        [(f"g{g}", float(v)) for g, v in rows], "g string, v double"
    )
    out = mood_median(df, "g", "v").collect()
    n = len(rows)
    xs = sorted(v for _, v in rows)
    m_lo, m_hi = xs[(n + 1) // 2 - 1], xs[n // 2]
    cells = {}
    for g, v in rows:
        a, b = cells.get(g, (0, 0))
        cells[g] = (a + (v > m_hi), b + (v < m_lo))
    used = {g: c for g, c in cells.items() if sum(c) > 0}
    if not used:
        assert out == []
        return
    [r] = out
    A = sum(a for a, _ in used.values())
    B = sum(b for _, b in used.values())
    assert (r["n"], r["n_used"], r["n_groups"]) == (n, A + B, len(used))
    assert (r["median_lo"], r["median_hi"]) == (m_lo, m_hi)
    assert r["df"] == len(used) - 1
    if A == 0 or B == 0:
        assert r["chi2"] is None
    else:
        chi = 0.0
        for a, b in used.values():
            ni = a + b
            ea, eb = ni * A / (A + B), ni * B / (A + B)
            chi += (a - ea) ** 2 / ea + (b - eb) ** 2 / eb
        assert abs(r["chi2"] - chi) < 2e-6
