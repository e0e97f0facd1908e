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
