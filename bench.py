#!/usr/bin/env python
"""Engine benchmark — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with the noop sink (full computation, no write cost,
no driver-side collect of large results). The headline set exercises every
engine subsystem: envelope wire + split + compaction, heavy aggregation,
broadcast star join, window functions, MinHash LSH dedup, embedding
similarity, streaming end-to-end, sessionization.

Methodology note (round-3 investigation of the r1->r2 per-query swings):
at sf0.1 a query's FIRST execution in a session is dominated by one-time
costs — whole-stage-codegen compilation of its (sometimes enormous)
generated class, datasource/parser init — e.g. cdc_compact measures ~6.3s
cold vs ~2.3s steady, minhash ~11s vs ~5.5s. On a real cluster those
compile once and amortize over TBs; at fixture scale they dominate and
wobble with machine state. ``queries`` / ``value`` keep the original
cold-run semantics for round-over-round comparability; ``queries_steady``
reports each query's second run in the same session — the number that
actually predicts at-scale throughput.

Round-7 addition (round-6 verdict #6): three heavyweights from the
round-4/6 waves (CDC verified merge, Mann-Whitney rank statistics, the
training-manifest capstone) join the measured set. ``value`` /
``steady_total`` keep the ORIGINAL nine-query totals for round-over-round
comparability; ``value_widened`` / ``steady_total_widened`` cover all 12.

Round-6 addition (round-5 verdict #5): single steady runs on this box
swing ±20% (minhash ±35%) with machine state, which round-over-round
comparison at a 2x bar cannot tolerate. Each query now runs cold once
then THREE steady repeats; ``queries_steady`` carries the per-query
MEDIAN and ``queries_steady_spread`` the [min, max], so a verdict can
attribute any delta to code vs noise mechanically.
"""

from __future__ import annotations

import json
import os
import time


HEADLINE = [
    "cdc_compact_customer",      # envelope wire round-trip + split + compact
    "q1_pricing_summary",        # scan-heavy aggregation over lineitem
    "join_broadcast_dims",       # broadcast star join
    "window_running_sum",        # window over orders
    "pandas_udf_revenue",        # Arrow UDF path
    "dedup_minhash_lsh",         # shingle -> minhash -> LSH -> verify
    "sim_pairs_topk",            # all-pairs embedding cosine
    "events_sessionize",         # gaps-and-islands sessionization
    "stream_split_customer",     # Structured Streaming end-to-end
    # round-7 widening (round-6 verdict #6): the original nine are
    # round-1 vintage and no longer span the engine — these three cover
    # the CDC-derived-state, rank-statistics, and capstone-composition
    # families users actually hit. Kept in a separate list so the
    # round-over-round comparison of the original nine stays clean.
]

HEADLINE_R7 = [
    "cdc_merge_verified",        # CDC merge + per-key verification checksums
    "quality_mann_whitney",      # rank statistics via distinct-value histogram
    "pipeline_training_manifest",  # split x fold x gate x soft-dedup capstone
]


def main() -> None:
    # round-13 verdict item 1: "stamp invalid and proceed" left the
    # artifact chain without a trustworthy driver floor for three rounds
    # running (both r13 legs self-stamped invalid).  Before any Spark
    # work, WAIT for the box to drain — bounded so a permanently-busy
    # host still produces an artifact: poll up to 10 min, start as soon
    # as 1-min < 1.0 and 5-min < 2.0.  This loop is entirely outside the
    # timed region (the session isn't even created yet).
    drain_deadline = time.monotonic() + 600
    while time.monotonic() < drain_deadline:
        one, five, _ = os.getloadavg()
        if one < 1.0 and five < 2.0:
            break
        time.sleep(30)
    # pre-existing host load, sampled BEFORE any Spark work: the bench
    # itself saturates the cores for minutes, so a post-run sample would
    # only measure the bench (round-12 review finding)
    load_before = [round(x, 2) for x in os.getloadavg()]
    # round-12 verdict item 2: two consecutive artifacts (BENCH_r11,
    # BENCH_r12) were load-inflated and had to be re-measured by hand;
    # the fingerprint above already detects the condition, so act on it.
    # A 5-min loadavg above ~2 on this 32-thread box means another
    # multi-minute workload is (or was very recently) saturating cores —
    # timings taken now would measure contention, not code.  The run
    # still completes (the driver needs an artifact either way) but the
    # JSON self-stamps invalid so no reader can mistake it for a floor.
    # With the drain-wait above, invalid now means the wait EXPIRED.
    invalid = load_before[1] > 2.0
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from split_kinesis_streams_with_glue_spark import get_spark
    from split_kinesis_streams_with_glue_spark.plans import all_queries

    spark = get_spark(app_name="bench")
    registry = all_queries()

    # warm the JVM/codegen once on a trivial action so the first measured
    # query doesn't pay session startup
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def run_once(fn) -> float:
        start = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        return round(time.perf_counter() - start, 3)

    timings: dict[str, float] = {}
    steady: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in HEADLINE + HEADLINE_R7:
        fn = registry[name].fn
        timings[name] = run_once(fn)  # cold: includes codegen compile
        reps = sorted(run_once(fn) for _ in range(3))
        steady[name] = reps[1]  # median of 3
        spread[name] = [reps[0], reps[2]]

    # `value` keeps the ORIGINAL nine-query cold total so the headline
    # metric stays comparable across every BENCH_r*.json; the widened
    # set reports alongside it
    total = round(sum(timings[n] for n in HEADLINE), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_steady": steady,
                "queries_steady_spread": spread,
                "steady_total": round(
                    sum(steady[n] for n in HEADLINE), 3
                ),
                "value_widened": round(sum(timings.values()), 3),
                "steady_total_widened": round(sum(steady.values()), 3),
                "sf": sf,
                # host-load fingerprint (round-11 verdict item 3): a bench
                # artifact taken on a loaded box is machine-detectable —
                # readers should distrust totals whose PRE-run loadavg is
                # well above idle (BENCH_r10/r11 were both load-inflated)
                "loadavg_before_1_5_15": load_before,
                # self-rejection (round-12 verdict item 2): true when the
                # pre-run 5-min loadavg exceeded 2.0 — the box was not
                # drained, so every timing above measures host contention
                # and MUST NOT be compared against drained floors
                "invalid": invalid,
            }
        )
    )


if __name__ == "__main__":
    main()
