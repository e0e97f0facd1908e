"""Skew and co-location tools (SURVEY.md X5 / §4.2).

AQE's skew-join splitting handles most skew at runtime; these are the
explicit forms for when the skew is known ahead of time or AQE can't see it
(e.g. the skewed side is mid-pipeline, not a materialized shuffle):

- ``salted_join``: replicate the small side across N salt buckets and
  scatter the skewed side uniformly — a hot key's rows spread over N tasks
  instead of one straggler. Result is provably identical to the plain join
  (the equi-join matches on (key, salt) and every key×salt pair exists on
  the replicated side).
- ``salted_agg``: two-phase aggregation — partial agg on (key, salt), then
  final agg on key. Works for any algebraic aggregate (sum/count/min/max);
  the built-in ``groupBy().agg()`` already does map-side partial combine,
  so this is only for extreme cases where even the post-combine per-key
  volume skews the reduce side.

Co-located (bucketed) joins need no operator: write both sides with
``df.write.bucketBy(n, key).sortBy(key).saveAsTable(...)`` and Spark's scan
planner drops the Exchange (asserted in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join a skewed frame with a (relatively) small frame, spreading
    each hot key across ``salt`` partitions.

    The salt value is uniform-random per skewed row — any assignment yields
    the same join result, so non-determinism here is harmless. The small
    side is replicated ``salt``× (its shuffle volume multiplies; keep it
    the smaller side).
    """
    s = skewed.withColumn("__salt", (F.rand(42) * salt).cast("int"))
    r = small.crossJoin(
        F.broadcast(
            skewed.sparkSession.range(salt).select(F.col("id").cast("int").alias("__salt"))
        )
    )
    out = s.join(r, [on, "__salt"], how)
    return out.drop("__salt")


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, str],
    salt: int = 32,
) -> DataFrame:
    """Two-phase aggregation for extreme key skew: ``aggs`` maps output
    column -> 'sum:col' | 'count' | 'min:col' | 'max:col' (algebraic, so
    partials compose)."""
    s = df.withColumn("__salt", (F.rand(42) * salt).cast("int"))
    partial_exprs, final_exprs = [], []
    for out_name, spec in aggs.items():
        if spec == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(f"__p_{out_name}"))
            final_exprs.append(F.sum(f"__p_{out_name}").alias(out_name))
        else:
            op, col = spec.split(":", 1)
            partial_exprs.append(getattr(F, op)(col).alias(f"__p_{out_name}"))
            combine = F.sum if op == "sum" else getattr(F, op)
            final_exprs.append(combine(f"__p_{out_name}").alias(out_name))
    partial = s.groupBy(key, "__salt").agg(*partial_exprs)
    return partial.groupBy(key).agg(*final_exprs)
