"""Retrieval-evaluation operators: fuse and compare ranked lists from
different retrieval systems (keyword BM25 vs embedding ANN).

A training-data pipeline that mines hard negatives, dedups against a
retrieval index, or builds eval sets runs BOTH a lexical ranker
(``operators/text.py bm25_scores``) and a vector ranker
(``operators/similarity.py brute_force_topk`` / the ANN family) over the
same corpus.  These operators answer the two questions that follow:
"what is the consensus ranking?" (reciprocal-rank fusion) and "how much
do the two systems agree?" (rank-overlap statistics).

Both operate on ranked TOP-K lists — bounded by contract (k rows per
system), so every join and pair comparison below is metadata-sized no
matter how large the corpus that produced the lists; the corpus-scale
work lives entirely in the upstream rankers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k_rrf: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked lists (Cormack, Clarke &
    Büttcher, "Reciprocal rank fusion outperforms Condorcet and
    individual rank learning methods", SIGIR 2009):
    ``rrf(d) = Σ_lists 1/(k + rank_d)`` with the paper's k = 60.  A doc
    absent from one list contributes only the other's term — the
    full-outer-join semantics of the original formulation.

    Returns (id, rank_a, rank_b, rrf_score) for every doc in either
    list; the caller cuts the fused top-N.  ``rrf_score`` is a sum of
    exactly two IEEE-exact reciprocals in fixed (a, b) order, so it is
    bit-identical across engines — safe to ORDER BY raw, no rounding
    needed for determinism (ties, e.g. a doc only in list A at rank r
    vs a doc only in list B at the same r, break on the id)."""
    a = ranked_a.select(
        F.col(id_col).alias("__id"), F.col(rank_col).alias("rank_a")
    )
    b = ranked_b.select(
        F.col(id_col).alias("__id2"), F.col(rank_col).alias("rank_b")
    )
    term = lambda c: F.coalesce(
        F.lit(1.0) / (F.lit(float(k_rrf)) + c.cast("double")), F.lit(0.0)
    )
    return a.join(b, a["__id"] == b["__id2"], "full_outer").select(
        F.coalesce(F.col("__id"), F.col("__id2")).alias(id_col),
        "rank_a",
        "rank_b",
        (term(F.col("rank_a")) + term(F.col("rank_b"))).alias("rrf_score"),
    )


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
