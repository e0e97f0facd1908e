"""Retrieval-evaluation operators: compare ranked lists from different
retrieval systems (keyword BM25 vs embedding ANN).

A training-data pipeline that mines hard negatives, dedups against a
retrieval index, or builds eval sets runs BOTH a lexical ranker
(``operators/text.py bm25_scores``) and a vector ranker
(``operators/similarity.py brute_force_topk`` / the ANN family) over the
same corpus.  FUSING the two rankings is already covered by
``operators/similarity.py rrf_fuse`` (reciprocal-rank fusion, round 7);
this module answers the question that comes BEFORE trusting the fusion:
"how much do the two systems even agree?" — the rank-overlap profile an
eval harness reads to decide whether hybrid retrieval is adding signal
or papering over a broken leg.

The operator works on ranked TOP-K lists — bounded by contract (k rows
per system), so every join and pair comparison below is metadata-sized
no matter how large the corpus that produced the lists; the corpus-scale
work lives entirely in the upstream rankers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rank_agreement(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """One-row agreement profile between two ranked top-k lists:

    - ``n_a`` / ``n_b`` / ``n_common`` — list sizes and overlap;
    - ``jaccard`` — |A∩B| / |A∪B|, the set-level agreement;
    - ``mean_rank_disp`` — mean |rank_a − rank_b| over the overlap
      (Spearman's footrule restricted to common docs, Diaconis &
      Graham, "Spearman's footrule as a measure of disarray", JRSS-B
      1977);
    - ``kendall_tau`` — Kendall's τ-a over the overlap: (concordant −
      discordant) / C(m, 2) pairs of common docs, using each system's
      original ranks (Kendall, "A new measure of rank correlation",
      Biometrika 1938).  NULL when the overlap has < 2 docs.

    Every statistic is an exact-integer fold (counts, rank
    differences, pair signs) with one final double division — no
    cross-engine float-order surface.  The pair comparison is a
    self-join of the ≤ k-row overlap on id < id (≤ C(k,2) pairs — a
    bounded nested-loop by construction, the jonckheere
    histogram-confined-pair-join class, never corpus-sized)."""
    a = ranked_a.select(
        F.col(id_col).alias("__id"), F.col(rank_col).alias("__ra")
    )
    b = ranked_b.select(
        F.col(id_col).alias("__id2"), F.col(rank_col).alias("__rb")
    )
    common = a.join(b, a["__id"] == b["__id2"]).select(
        "__id", "__ra", "__rb"
    ).localCheckpoint(eager=False)
    sizes = (
        a.agg(F.count(F.lit(1)).alias("n_a"))
        .crossJoin(b.agg(F.count(F.lit(1)).alias("n_b")))
        .crossJoin(
            common.agg(
                F.count(F.lit(1)).alias("n_common"),
                F.sum(F.abs(F.col("__ra") - F.col("__rb"))).alias("__disp"),
            )
        )
    )
    l, r = common.alias("l"), common.alias("r")
    dd = (F.col("l.__ra") - F.col("r.__ra")) * (
        F.col("l.__rb") - F.col("r.__rb")
    )
    pairs = l.join(r, F.col("l.__id") < F.col("r.__id")).agg(
        F.sum((dd > 0).cast("long")).alias("__conc"),
        F.sum((dd < 0).cast("long")).alias("__disc"),
    )
    m = F.col("n_common").cast("double")
    return sizes.crossJoin(pairs).select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("n_common").cast("bigint").alias("n_common"),
        F.when(
            F.col("n_a") + F.col("n_b") - F.col("n_common") > 0,
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ),
        ).alias("jaccard"),
        F.when(
            F.col("n_common") > 0,
            F.round(F.col("__disp") / m, 6),
        ).alias("mean_rank_disp"),
        F.when(
            F.col("n_common") >= 2,
            F.round(
                (F.col("__conc") - F.col("__disc"))
                / (m * (m - 1) / 2.0),
                6,
            ),
        ).alias("kendall_tau"),
    )


def rbo_overlap(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    k: int = 20,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Rank-Biased Overlap between two ranked top-k lists (Webber,
    Moffat & Zobel, "A similarity measure for indefinite rankings",
    TOIS 2010): the geometrically-weighted average of the per-depth
    agreement A_d = X_d / d (X_d = size of the intersection of the two
    depth-d prefixes), extrapolated past depth k by assuming the
    depth-k agreement persists:

        RBO_ext = (X_k / k) * p^k + ((1-p)/p) * sum_{d=1..k} (X_d/d) p^d

    ``rank_agreement`` weighs every rank equally; RBO is the
    TOP-WEIGHTED twin — disagreement at rank 1 costs more than at rank
    20, which is what a retrieval pipeline actually cares about when
    only the head of the list is ever consumed.

    Persistence p is FIXED at 1/2 (top-heavy; expected viewing depth
    1/(1-p) = 2) deliberately: p^d = 2^-d is EXACT in binary floating
    point, so every term (X_d/d) * 2^-d is one correctly-rounded IEEE
    division followed by an exact power-of-two scaling, and
    (1-p)/p = 1 removes the leading factor — no libm pow() and no
    cross-engine ulp class anywhere (the aov_periodogram design rule).
    Terms are 9-dp-quantized and summed as DECIMAL(38,9), so the fold
    is order-free on both engines.

    Depth spine and prefix-overlap counts are metadata-sized
    (k rows, <= C(k,2)-class joins over two <= k-row lists — the
    rank_agreement boundedness contract); the corpus-scale work lives
    in the upstream rankers.  Returns one row
    (k, n_common, agreement_k, rbo_ext)."""
    if not 1 <= k <= 62:
        # the 2^-d weight rides a 64-bit shift: depth 63 hits the sign
        # bit and depth 64 wraps — refuse rather than return garbage
        raise ValueError("rbo_overlap requires 1 <= k <= 62")
    a = ranked_a.select(
        F.col(id_col).alias("__id"), F.col(rank_col).alias("__ra")
    )
    b = ranked_b.select(
        F.col(id_col).alias("__id2"), F.col(rank_col).alias("__rb")
    )
    common = a.join(b, a["__id"] == b["__id2"]).select(
        F.greatest(F.col("__ra"), F.col("__rb")).alias("__dmin")
    )
    spine = (
        a.sparkSession.range(1, k + 1)
        .select(F.col("id").cast("int").alias("__d"))
    )
    xd = (
        spine.join(common, common["__dmin"] <= spine["__d"], "left")
        .groupBy("__d")
        .agg(F.count(common["__dmin"]).alias("__x"))
    )
    # 2^-d via an integer shift + one exact division — no libm pow()
    term = (F.col("__x") / F.col("__d")) / F.expr(
        "cast(shiftleft(1L, __d) as double)"
    )
    agg = xd.agg(
        F.sum(
            F.round(term, 9).cast("decimal(38,9)")
        ).alias("__tsum"),
        F.max(F.when(F.col("__d") == k, F.col("__x"))).alias("__xk"),
    )
    return agg.select(
        F.lit(k).cast("bigint").alias("k"),
        F.col("__xk").cast("bigint").alias("n_common"),
        F.round(F.col("__xk") / F.lit(float(k)), 6).alias("agreement_k"),
        F.round(
            (F.col("__xk") / F.lit(float(k))) * F.lit(0.5 ** k)
            + F.col("__tsum").cast("double"),
            6,
        ).alias("rbo_ext"),
    )


def multi_query_eval(
    system: DataFrame,
    truth: DataFrame,
    k: int,
    p_at: int,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Macro-averaged ranked-retrieval quality over a PANEL of queries —
    the grouped eval the single-slice metrics (average_precision,
    ndcg_at_k, rank_agreement) cannot give: per query, the reciprocal
    rank of the first relevant hit (MRR, Voorhees, "The TREC-8 Question
    Answering Track Report", 1999), precision at ``p_at`` and recall at
    ``k``; then the arithmetic mean of each metric across queries.

    ``system`` is (query_col, id_col, rank_col) — each query's ranked
    top-k candidates; ``truth`` is (query_col, id_col) — each query's
    relevant set.  A query with no relevant doc retrieved scores
    rr = 0 / recall = 0 (the TREC convention), and every query in
    ``truth`` counts in the macro average whether or not the system
    returned anything for it.

    Exactness: hit counts and first-hit ranks are integer folds inside
    a (query)-keyed aggregate; rr = 1/rank and the per-query ratios are
    single IEEE divisions; the cross-query means fold 9-dp-quantized
    DECIMAL(38,9) terms (order-free on both engines — the rbo_overlap
    pattern).  All joins are keyed on (query, doc) over bounded
    top-k / relevant-set frames; the corpus-scale ranking work lives
    upstream.  Returns one row
    (n_queries, k, p_at, mrr, mean_precision, mean_recall)."""
    s = system.select(
        F.col(query_col).alias("__q"),
        F.col(id_col).alias("__id"),
        F.col(rank_col).alias("__r"),
    ).filter(
        # the reported k must be the k the computation applied: a
        # system frame carrying ranks beyond k would otherwise inflate
        # recall@k silently (post-wave review)
        F.col("__r") <= k
    )
    t = truth.select(
        F.col(query_col).alias("__tq"), F.col(id_col).alias("__tid")
    )
    hits = s.join(
        t, (s["__q"] == t["__tq"]) & (s["__id"] == t["__tid"])
    ).select("__q", "__r")
    per_hit = hits.groupBy("__q").agg(
        F.min("__r").alias("__first"),
        F.sum((F.col("__r") <= p_at).cast("long")).alias("__hits_p"),
        F.count(F.lit(1)).alias("__hits_k"),
    )
    per_query = (
        t.groupBy(F.col("__tq").alias("__q"))
        .agg(F.count(F.lit(1)).alias("__n_rel"))
        .join(per_hit, "__q", "left")
    )
    rr = F.coalesce(1.0 / F.col("__first"), F.lit(0.0))
    prec = F.coalesce(F.col("__hits_p"), F.lit(0)) / F.lit(float(p_at))
    rec = F.coalesce(F.col("__hits_k"), F.lit(0)) / F.col("__n_rel")
    dsum = lambda c: F.sum(F.round(c, 9).cast("decimal(38,9)"))  # noqa: E731
    agg = per_query.agg(
        F.count(F.lit(1)).alias("__nq"),
        dsum(rr).alias("__rr"),
        dsum(prec).alias("__pr"),
        dsum(rec).alias("__rc"),
    )
    nq = F.col("__nq").cast("double")
    return agg.select(
        F.col("__nq").cast("bigint").alias("n_queries"),
        F.lit(k).cast("bigint").alias("k"),
        F.lit(p_at).cast("bigint").alias("p_at"),
        F.round(F.col("__rr").cast("double") / nq, 6).alias("mrr"),
        F.round(F.col("__pr").cast("double") / nq, 6).alias("mean_precision"),
        F.round(F.col("__rc").cast("double") / nq, 6).alias("mean_recall"),
    )
