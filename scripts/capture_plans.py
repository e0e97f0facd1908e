#!/usr/bin/env python
"""Capture .explain("formatted") output for the bench headline queries.

Usage: python scripts/capture_plans.py <out_suffix> [query ...]
Writes plans/<SPARK_GRAFT_PLANS_DIR, default r14>/<query>_<out_suffix>.txt
for each query (default: the 12 bench headliners). Plan capture only — no
noop execution — but queries whose builder runs eager work (streaming
drains, merges) do execute that work.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUFFIX = sys.argv[1] if len(sys.argv) > 1 else "before"
NAMES = sys.argv[2:] or [
    "cdc_compact_customer",
    "q1_pricing_summary",
    "join_broadcast_dims",
    "window_running_sum",
    "pandas_udf_revenue",
    "dedup_minhash_lsh",
    "sim_pairs_topk",
    "events_sessionize",
    "stream_split_customer",
    "cdc_merge_verified",
    "quality_mann_whitney",
    "pipeline_training_manifest",
]


def main() -> None:
    from split_kinesis_streams_with_glue_spark import get_spark
    from split_kinesis_streams_with_glue_spark.plans import all_queries

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="capture-plans")
    registry = all_queries()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_DIR", "r14"),
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in NAMES:
        df = registry[name].fn(spark, sf_dir)
        # public API only: explain() prints the same string the old
        # PythonSQLUtils.explainString JVM internal returned, and survives
        # PySpark upgrades / Spark Connect (round-13 advice)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        path = os.path.join(out_dir, f"{name}_{SUFFIX}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(name, "->", path)


if __name__ == "__main__":
    main()
