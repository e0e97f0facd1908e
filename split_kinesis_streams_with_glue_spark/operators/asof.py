"""As-of (temporal nearest) join — an operator Spark lacks natively.

For each left row, attach the most recent right row with the same key and
``right_ts <= left_ts``. The classic CDC/analytics primitive: "state of X
as of the time of Y" (e.g. the last event before each order).

Formulation (scale-first): tag and UNION the two inputs, then one window
pass per key ordered by time carrying the latest right row forward
(``last(payload_struct, ignorenulls=True)``). The payload travels as ONE
struct so all its columns always come from the same right row (per-column
carry would mix rows when a payload column is legitimately NULL). Exactly
one shuffle (by key) and one sort — the same cost envelope as a sort-merge
join, with none of the range-join blowup of the naive
``left.ts >= right.ts`` theta join, whose candidate set is quadratic per
key.

DuckDB expresses this natively as ``ASOF JOIN``; that is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join. Right payload columns arrive suffixed; left rows
    with no qualifying right row keep NULLs (left-outer semantics).

    Ties: a right row with ``right_ts == left_ts`` qualifies (<=). When
    several right rows share one timestamp, the last within the window
    order wins — make the order total upstream if that matters.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    payload = F.struct(*[F.col(c) for c in right_cols])
    payload_type = right.select(payload.alias("p")).schema["p"].dataType

    l_tagged = left.select(
        "*",
        # common orderable type for both sides; unlike a double cast this
        # keeps microseconds and accepts TIMESTAMP_NTZ inputs too
        F.col(left_ts).cast("timestamp").alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(payload_type).alias("__payload"),
    )
    r_tagged = right.select(
        F.col(on),
        F.col(right_ts).cast("timestamp").alias("__t"),
        F.lit(0).alias("__is_left"),
        payload.alias("__payload"),
    )
    for c in left.columns:
        if c != on:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l_tagged.unionByName(r_tagged.select(*l_tagged.columns))
    # right rows sort BEFORE left rows at equal time so <= ties qualify
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__t"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__p", F.last(F.col("__payload"), ignorenulls=True).over(w)
    )
    return (
        carried.filter(F.col("__is_left") == 1)
        .select(
            *[c for c in left.columns],
            *[F.col(f"__p.{c}").alias(f"{c}{suffix}") for c in right_cols],
        )
    )


def point_in_time_join(
    facts: DataFrame,
    history: DataFrame,
    on: str,
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    payload_cols: list[str] | None = None,
    suffix: str = "_pit",
) -> DataFrame:
    """Point-in-time join against SCD2 validity intervals — the
    feature-store primitive: attach to each fact the dimension version
    whose ``[valid_from, valid_to)`` contains the fact's timestamp, and
    NOTHING when the entity was deleted (or not yet created) at that time.

    A naive key-join + validity filter fans every fact out across all of
    its key's versions before filtering. This instead rides ``asof_join``
    (one key shuffle, latest ``valid_from <= ts`` version carried by a
    window — no fanout) and then applies the expiry mask: if the attached
    version's ``valid_to`` is at or before the fact's timestamp, the
    entity's history was CLOSED there (a delete) and the payload nulls
    out — the leakage-free semantics training-data pipelines need (no
    peeking at versions that didn't exist yet, no resurrecting deleted
    entities)."""
    payload_cols = payload_cols or [
        c for c in history.columns if c not in (on, valid_from, valid_to)
    ]
    joined = asof_join(
        facts,
        history,
        on=on,
        left_ts=ts_col,
        right_ts=valid_from,
        right_cols=[*payload_cols, valid_to],
        suffix=suffix,
    )
    vt = F.col(f"{valid_to}{suffix}")
    alive = vt.isNull() | (F.col(ts_col).cast("timestamp") < vt)
    sel = [F.col(c) for c in facts.columns]
    for c in payload_cols:
        sel.append(
            F.when(alive, F.col(f"{c}{suffix}")).alias(f"{c}{suffix}")
        )
    return joined.select(*sel)


def asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    tolerance_seconds: float,
    right_cols: list[str] | None = None,
    suffix: str = "_near",
) -> DataFrame:
    """Nearest-event as-of join with a tolerance: for each left row,
    attach the right row (same key) whose timestamp is CLOSEST in either
    direction, if any lies within ``tolerance_seconds``; ties at equal
    distance resolve backward (the earlier right row). The
    sensor-alignment / attribution primitive ``asof_join``'s
    backward-only semantics can't express.

    Same scale-first formulation as ``asof_join`` — tag + union, then ONE
    window pass per key carrying BOTH the latest-preceding payload
    (``last ... ignorenulls`` over the preceding frame) and the
    earliest-following payload (``first`` over the following frame):
    exactly one shuffle and one sort, no quadratic range-join fanout.
    Distances compare in exact integer MICROSECONDS (a float-seconds
    subtraction can flip a tie by an ulp). Assumes right timestamps are
    unique per key (dedupe upstream otherwise, as with ``asof_join``'s
    tie note). Output adds the suffixed right payload columns and
    ``distance_us{suffix}`` (NULL when nothing is in tolerance)."""
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    payload = F.struct(
        F.unix_micros(F.col(right_ts).cast("timestamp")).alias("__rt"),
        *[F.col(c) for c in right_cols],
    )
    ptype = right.select(payload.alias("p")).schema["p"].dataType
    l_tagged = left.select(
        "*",
        F.col(left_ts).cast("timestamp").alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(ptype).alias("__payload"),
    )
    r_tagged = right.select(
        F.col(on),
        F.col(right_ts).cast("timestamp").alias("__t"),
        F.lit(0).alias("__is_left"),
        payload.alias("__payload"),
    )
    for c in left.columns:
        if c != on:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l_tagged.unionByName(r_tagged.select(*l_tagged.columns))
    wb = (
        Window.partitionBy(on)
        .orderBy("__t", "__is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(on)
        .orderBy("__t", "__is_left")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = unioned.withColumn(
        "__pb", F.last("__payload", ignorenulls=True).over(wb)
    ).withColumn("__pf", F.first("__payload", ignorenulls=True).over(wf))
    t_us = F.unix_micros(F.col("__t"))
    bd = t_us - F.col("__pb.__rt")
    fd = F.col("__pf.__rt") - t_us
    tol_us = int(round(float(tolerance_seconds) * 1_000_000))
    back_ok = F.col("__pb").isNotNull() & (bd <= tol_us)
    fwd_ok = F.col("__pf").isNotNull() & (fd <= tol_us)
    use_back = back_ok & (~fwd_ok | (bd <= fd))
    chosen = F.when(use_back, F.col("__pb")).when(fwd_ok, F.col("__pf"))
    dist = F.when(use_back, bd).when(fwd_ok, fd)
    return (
        carried.filter(F.col("__is_left") == 1)
        .withColumn("__chosen", chosen)
        .select(
            *[c for c in left.columns],
            *[F.col(f"__chosen.{c}").alias(f"{c}{suffix}") for c in right_cols],
            dist.cast("bigint").alias(f"distance_us{suffix}"),
        )
    )
