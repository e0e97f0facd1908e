"""Probabilistic record linkage — Fellegi–Sunter feature weights.

The classical entity-resolution framework (Fellegi & Sunter, JASA 1969):
for each comparison feature f, estimate

- ``m_f`` — P(records AGREE on f | the pair is a true match), and
- ``u_f`` — P(records agree on f | the pair is random),

and score candidate pairs by summing per-feature log-likelihood-ratio
weights: ``log2(m/u)`` when the feature agrees, ``log2((1-m)/(1-u))``
when it disagrees.  A feature that matches on near-identical records but
rarely by chance (high m, low u) earns a large positive agreement
weight; a feature that agrees all the time anyway (u ≈ m) earns none —
the principled version of "name agreement means more than country
agreement".

Estimation here is fully deterministic and engine-portable, the two
classical shortcuts composed:

- **u from the value histogram, exactly**: the probability two distinct
  random records agree on f is ``Σ_v c_v(c_v−1) / (N(N−1))`` over the
  per-value counts — one histogram aggregate, no pair sampling (the
  "frequency-based u" of the linkage literature).
- **m from a match proxy**: any labeled-match pair set works; the dedup
  stack's verified near-duplicate pairs are the natural unsupervised
  proxy (near-identical text ⇒ same real-world record).  m is
  Laplace-smoothed — ``(2·agree+1) / (2·(pairs+1))`` — so a feature
  that agrees on every (or no) proxy pair still gets a finite weight.

All probabilities are single IEEE divisions of exact integer counts, so
the same expressions hash identically in an ANSI-SQL oracle; the only
transcendental is the final ``log2``, rounded after.

Scale shape: the u side is one stack-explode of the feature columns into
a (feature, value) frame + one groupBy — a single corpus scan for ANY
number of features.  The m side joins the (small) match-pair frame to
the records twice and folds one row.  Output is |features| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def linkage_feature_weights(
    records: DataFrame,
    pairs: DataFrame,
    features: list[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-feature Fellegi–Sunter (m, u, weight) table.

    ``records`` carries ``id_col`` and the feature columns (cast to
    string for null-safe comparison; derive bucketed features with
    ``withColumn`` first).  ``pairs`` is the match-proxy frame
    ``(d1, d2)`` — e.g. verified near-dup pairs.  Returns one row per
    feature: (feature, n_pairs, m_prob, u_prob, weight_agree,
    weight_disagree); agreement weight is NULL when u = 0 (all values
    distinct — no chance-agreement baseline), disagreement weight NULL
    when u = 1 (constant feature — no disagreement is possible)."""
    k = len(features)
    a = records.select(
        F.col(id_col).alias("__d1"),
        *[F.col(f).cast("string").alias(f"__a_{f}") for f in features],
    )
    b = records.select(
        F.col(id_col).alias("__d2"),
        *[F.col(f).cast("string").alias(f"__b_{f}") for f in features],
    )
    joined = (
        pairs.select(F.col("d1").alias("__d1"), F.col("d2").alias("__d2"))
        .join(a, "__d1")
        .join(b, "__d2")
    )
    agr = joined.agg(
        F.count(F.lit(1)).alias("__p"),
        *[
            F.sum(
                F.col(f"__a_{f}").eqNullSafe(F.col(f"__b_{f}")).cast("int")
            ).alias(f"__ag_{f}")
            for f in features
        ],
    )
    m_stack = "stack({}, {})".format(
        k, ", ".join(f"'{f}', __ag_{f}" for f in features)
    )
    mrows = agr.select("__p", F.expr(m_stack).alias("feature", "__agree"))

    u_stack = "stack({}, {})".format(
        k, ", ".join(f"'{f}', CAST({f} AS STRING)" for f in features)
    )
    hist = (
        records.select(F.expr(u_stack).alias("feature", "__v"))
        .groupBy("feature", "__v")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    uprob = (
        hist.groupBy("feature")
        .agg(
            F.sum("__c").alias("__n"),
            F.sum(F.col("__c") * (F.col("__c") - 1)).alias("__ss"),
        )
        .select(
            "feature",
            (
                F.col("__ss").cast("double")
                / (F.col("__n") * (F.col("__n") - 1)).cast("double")
            ).alias("__u"),
            (
                (F.col("__n") * (F.col("__n") - 1) - F.col("__ss")).cast("double")
                / (F.col("__n") * (F.col("__n") - 1)).cast("double")
            ).alias("__u1"),  # 1-u in exact integer form (no 1.0-x drift)
        )
    )
    # m and 1-m as single divisions of exact integers: bit-identical in
    # any IEEE engine, so the oracle mirrors them verbatim
    m = (2 * F.col("__agree") + 1).cast("double") / (
        2 * (F.col("__p") + 1)
    ).cast("double")
    m1 = (2 * (F.col("__p") - F.col("__agree")) + 1).cast("double") / (
        2 * (F.col("__p") + 1)
    ).cast("double")
    return mrows.join(uprob, "feature").select(
        "feature",
        F.col("__p").cast("bigint").alias("n_pairs"),
        F.round(m, 6).alias("m_prob"),
        F.round("__u", 6).alias("u_prob"),
        F.when(F.col("__u") > 0, F.round(F.log2(m / F.col("__u")), 6)).alias(
            "weight_agree"
        ),
        F.when(
            F.col("__u1") > 0, F.round(F.log2(m1 / F.col("__u1")), 6)
        ).alias("weight_disagree"),
    )
