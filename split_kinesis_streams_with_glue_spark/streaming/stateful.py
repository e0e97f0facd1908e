"""Custom stateful streaming operators (SURVEY.md T6/T7).

The reference pipeline defers stateful semantics to consumers; a real
engine needs them first-class. Two operators:

- ``sessionize_stream`` — per-key inactivity-gap sessionization via
  ``applyInPandasWithState``: bounded per-user state (one open session),
  event-time timeouts evict idle state, closed sessions are emitted with
  the SAME columns and numbering as the batch gaps-and-islands query
  (plans/event_queries.events_sessionize), so the streaming operator is
  checkable against the identical SQL oracle.
- ``dedup_stream_within_watermark`` — streaming exact dedup whose state is
  dropped once the watermark passes (``dropDuplicatesWithinWatermark``),
  the unbounded-stream-safe form of ``dropDuplicates``.

Scale posture: state per group is O(1) (a single open-session tuple / a key
within the watermark horizon); the shuffle key is the group key, so state is
evenly spread across executors; watermark-driven timeouts bound total state.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: event_type value that flushes (closes + emits) a user's open session
#: without contributing an event — lets an availableNow drain emit every
#: session deterministically instead of leaving the tail in state.
FLUSH_EVENT = "__flush__"

#: effectively-never event-time timeout for closed-session marker state
#: (year ~2096); markers are evicted by a flush or survive as one small
#: tuple per user — the price of globally monotone session ordinals.
_FAR_FUTURE_MS = 4_000_000_000_000

SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("session_start_es", T.LongType()),
        T.StructField("session_end_es", T.LongType()),
        T.StructField("session_value", T.DoubleType()),
    ]
)

#: open-session state: next session ordinal + running aggregate
SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_id", T.LongType()),
        T.StructField("start_es", T.LongType()),
        T.StructField("end_es", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
    ]
)


def _session_fn(gap_seconds: int):
    """Build the per-group state-transition function.

    Vectorized within each batch: events are segmented by gap via a cumsum
    over (diff > gap); only the tail segment stays open in state. Emission
    order and session numbering match the batch formulation because segments
    are processed in event-time order.
    """

    def fn(
        key: Tuple[Any, ...], pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        uid = key[0]

        def emit(sid, s, e, n, v):
            return {
                "user_id": uid,
                "session_id": sid,
                "n_events": n,
                "session_start_es": s,
                "session_end_es": e,
                "session_value": round(v, 4),
            }

        if state.hasTimedOut:
            sid, s, e, n, v = state.get
            if n > 0:
                # close the idle session; keep a zero-event MARKER so the
                # per-user session ordinal survives (the oracle numbers
                # sessions monotonically per user over all time)
                state.update((sid, e, e, 0, 0.0))
                state.setTimeoutTimestamp(_FAR_FUTURE_MS)
                yield pd.DataFrame([emit(sid, s, e, n, v)])
            else:
                state.remove()
            return

        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["es", "event_id"], kind="mergesort"
        )
        flush = bool((rows["event_type"] == FLUSH_EVENT).any())
        rows = rows[rows["event_type"] != FLUSH_EVENT]

        open_sess = list(state.get) if state.exists else None
        out = []
        if len(rows):
            es = rows["es"].to_numpy()
            val = rows["value"].to_numpy()
            import numpy as np

            seg = np.cumsum(np.concatenate([[0], (np.diff(es) > gap_seconds).astype(np.int64)]))
            for s_idx in range(int(seg[-1]) + 1):
                m = seg == s_idx
                s_es, e_es = int(es[m].min()), int(es[m].max())
                n, v = int(m.sum()), float(val[m].sum())
                if (
                    open_sess is not None
                    and s_idx == 0
                    and open_sess[3] > 0
                    and s_es - open_sess[2] <= gap_seconds
                ):
                    # continues the open session
                    open_sess = [
                        open_sess[0],
                        open_sess[1],
                        e_es,
                        open_sess[3] + n,
                        open_sess[4] + v,
                    ]
                else:
                    if open_sess is not None:
                        if open_sess[3] > 0:
                            out.append(emit(*open_sess))
                        next_sid = open_sess[0] + 1
                    else:
                        next_sid = 1
                    open_sess = [next_sid, s_es, e_es, n, v]
        if flush:
            if open_sess is not None and open_sess[3] > 0:
                out.append(emit(*open_sess))
            state.remove()
        elif open_sess is not None and open_sess[3] > 0:
            state.update(tuple(open_sess))
            # evict via event-time timeout once the watermark passes the gap
            timeout_ms = (open_sess[2] + gap_seconds) * 1000
            state.setTimeoutTimestamp(max(timeout_ms, state.getCurrentWatermarkMs() + 1))
        if out:
            yield pd.DataFrame(out)

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 900,
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Inactivity-gap sessionization of an event stream.

    Emits one row per CLOSED session (same shape as the batch
    ``events_sessionize`` query). A session closes when (a) a later event
    for the same user arrives past the gap, (b) the event-time watermark
    passes ``last_event + gap`` (timeout), or (c) a ``FLUSH_EVENT``
    sentinel arrives for the user (deterministic drain).
    """
    prepared = (
        events.withWatermark(ts_col, watermark)
        .withColumn("es", F.unix_timestamp(F.col(ts_col)))
        .select(user_col, "es", "event_id", "event_type", "value", ts_col)
    )
    return prepared.groupBy(user_col).applyInPandasWithState(
        _session_fn(gap_seconds),
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def dedup_stream_within_watermark(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming exact dedup with bounded state: a key's dedup record is
    dropped once the watermark passes its event time, so duplicates are
    suppressed within the lateness horizon and state never grows without
    bound — the only safe contract on an infinite CDC stream."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)


def stream_interval_join(
    left,
    right,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "r_ts",
    lookback: str = "10 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
):
    """Watermarked stream-stream join: each left event pairs with the
    right-stream events of the same key within ``lookback`` before it.

    The time-bound predicate is what makes an unbounded stream-stream join
    feasible: it tells Spark exactly when buffered right-side state can
    never match again, so (with both watermarks) state is evicted instead
    of growing forever — per-key state is O(events within lookback +
    watermark). The shuffle key is the join key; skew rules from the batch
    side apply unchanged.

    ``how='left_outer'`` additionally emits the null-extended row for left
    events that found no partner — but only when the watermark passes the
    event's match window (that is when 'no partner' becomes a fact, not a
    not-yet). Consequence: rows near the end of a drained stream never
    emit unless something advances the watermark past them — push a
    far-future sentinel through both streams (and filter it downstream),
    the same flush idiom sessionize_stream uses."""
    from pyspark.sql import functions as F

    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    return lw.join(
        rw,
        F.expr(
            f"{on} = r_{on} AND {right_ts} BETWEEN {left_ts} - interval {lookback}"
            f" AND {left_ts}"
        ),
        how,
    )
