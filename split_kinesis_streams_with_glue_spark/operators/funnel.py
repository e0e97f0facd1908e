"""Ordered funnel analysis over event streams.

``funnel`` computes, for an ordered list of step event-types, how many users
completed each prefix of the sequence IN ORDER: step k counts users with an
event of type k strictly after their step-(k-1) completion time (first-touch
semantics: each step's completion time is the earliest qualifying event).

Distributed shape: one scan of the events table (filtered to the step types,
pushed to the reader), then per-step a keyed min-aggregate joined on
``user_id`` — every shuffle reuses the same user_id hash distribution, so at
scale the chain is k co-partitioned narrow joins, each input shrinking
monotonically (step-k survivors only). The final count is a tiny global agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within: str | None = None,
) -> DataFrame:
    """Return one row per funnel step: (step, event_type, n_users).

    ``n_users`` for step i = users who performed ``steps[0..i]`` in order;
    with ``within`` (an INTERVAL string, e.g. ``"1 hour"``) each step must
    additionally happen within that much time of the previous step's
    completion — the conversion-window form.
    """
    ev = events.filter(F.col(type_col).isin(steps)).select(
        user_col, type_col, ts_col
    )
    counts = []
    survivors = None  # (user_id, completed_ts) for the last completed step
    for i, step in enumerate(steps):
        this = ev.filter(F.col(type_col) == step)
        if survivors is not None:
            this = this.join(survivors, user_col).filter(
                F.col(ts_col) > F.col("__prev_ts")
            )
            if within is not None:
                this = this.filter(
                    F.col(ts_col) <= F.expr(f"__prev_ts + interval {within}")
                )
        survivors = this.groupBy(user_col).agg(F.min(ts_col).alias("__prev_ts"))
        counts.append(
            survivors.agg(
                F.lit(i + 1).alias("step"),
                F.lit(step).alias("event_type"),
                F.count(F.lit(1)).alias("n_users"),
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def funnel_latency(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Conversion-latency distribution for the completed funnel: for every
    user who finishes all ``steps`` in order (same greedy first-touch walk
    as ``funnel`` — each step's completion is the EARLIEST occurrence
    after the previous step), the time from the first step to the final
    one; reported as count / median / p90 / max in seconds. The
    'how long does view→purchase take' companion the step-count funnel
    can't answer — the p90 is what an abandonment window should be set
    from.

    Latencies compare in exact integer microseconds (float-seconds
    subtraction can flip interpolation boundaries); the percentile runs
    over the converted-user frame — per-user rows, not events — with the
    iterative exact-quantile machinery the documented swap-in when even
    that frame outgrows a sort. Returns one row
    (n_converted, p50_seconds, p90_seconds, max_seconds)."""
    ev = events.filter(F.col(type_col).isin(steps)).select(
        user_col, type_col, ts_col
    )
    survivors = None
    for i, step in enumerate(steps):
        this = ev.filter(F.col(type_col) == step)
        if survivors is None:
            survivors = this.groupBy(user_col).agg(
                F.min(ts_col).alias("__prev_ts")
            )
            survivors = survivors.withColumn("__first_ts", F.col("__prev_ts"))
        else:
            this = this.join(survivors, user_col).filter(
                F.col(ts_col) > F.col("__prev_ts")
            )
            survivors = this.groupBy(user_col, "__first_ts").agg(
                F.min(ts_col).alias("__prev_ts")
            )
    # fixture timestamps can surface as TIMESTAMP_NTZ (no numeric cast,
    # and unix_micros rejects it) — the UTC-session timestamp cast is the
    # documented normalization (verify-skill gotcha)
    lat = survivors.select(
        (
            F.unix_micros(F.col("__prev_ts").cast("timestamp"))
            - F.unix_micros(F.col("__first_ts").cast("timestamp"))
        ).alias("__us")
    )
    return lat.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converted"),
        F.round(F.expr("percentile(__us, 0.5)") / 1e6, 6).alias("p50_seconds"),
        F.round(F.expr("percentile(__us, 0.9)") / 1e6, 6).alias("p90_seconds"),
        F.round(F.max("__us") / 1e6, 6).alias("max_seconds"),
    )
