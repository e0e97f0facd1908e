"""Computable staleness SLA for driver re-verification (round-6 verdict #4).

SURVEY §13 once claimed "after this round no query's newest driver row
predates round 4 except the 3 documented deferrals" — which was
arithmetically impossible and false (98 queries' newest row was r2/r3):
with ~300 registered queries and a 50-slot driver window, a full refresh
cycle takes ceil(N / 50) rounds no matter how the window is allocated.

This test pins the achievable SLA instead: **every oracle-backed query
must have a driver CORRECTNESS row within the last ceil(N / 50) rounds**
(N = current registry size, so the SLA self-adjusts as the registry
grows), where "within" is judged against the round currently in flight.
A query about to violate the SLA passes only if this round's window (the
first 50 registry slots) or the bounded ``DEFERRED`` list already
schedules it — i.e. the test fails exactly when a query would silently
age past the cycle without a plan to re-verify it.

Never-checked queries are the rotation tests' jurisdiction
(``test_registry_rotation.py``); this file covers the EVER-checked tail
that the rotation tests deliberately ignore.
"""

from __future__ import annotations

import glob
import json
import math
import os

from split_kinesis_streams_with_glue_spark.plans.all import DEFERRED, all_queries

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def _newest_rows() -> dict[str, int]:
    newest: dict[str, int] = {}
    for path in glob.glob(os.path.join(REPO_ROOT, "CORRECTNESS_r*.json")):
        rnd = int(os.path.basename(path)[len("CORRECTNESS_r") : -len(".json")])
        with open(path) as fh:
            for name in json.load(fh):
                newest[name] = max(newest.get(name, 0), rnd)
    return newest


def test_every_checked_oracle_query_is_inside_the_refresh_cycle():
    reg = all_queries()
    newest = _newest_rows()
    if not newest:  # fresh clone without driver artifacts
        return
    current = max(newest.values()) + 1  # the round in flight
    sla = math.ceil(len(reg) / WINDOW)
    window = set(list(reg)[:WINDOW])
    stale = [
        (n, newest[n])
        for n in reg
        if reg[n].oracle is not None
        and n in newest
        and newest[n] < current - sla
        and n not in window
        and n not in DEFERRED
    ]
    assert not stale, (
        f"{len(stale)} oracle-backed queries have no driver row in the last "
        f"{sla} rounds (current round {current}) and are neither in this "
        f"round's window nor in DEFERRED: {stale}. Allocate window slots "
        f"(or a bounded deferral) before they age out of the cycle."
    )


def test_refresh_cycle_headroom_is_reported_accurately():
    """The SLA is only meaningful if the window arithmetic stays sane:
    the registry must not grow so fast that even a perfectly-allocated
    window cannot cycle it. Guard: the number of queries that will
    EXCEED the SLA next round must fit one window together with the
    standing backlog (never-checked + deferred) — otherwise the
    evidence plan is structurally behind, not just this round's
    ordering."""
    reg = all_queries()
    newest = _newest_rows()
    if not newest:
        return
    current = max(newest.values()) + 1
    sla = math.ceil(len(reg) / WINDOW)
    due_next = [
        n
        for n in reg
        if reg[n].oracle is not None and n in newest and newest[n] <= current - sla
    ]
    never = [n for n in reg if n not in newest]
    assert len(due_next) + len(never) <= 2 * WINDOW, (
        f"{len(due_next)} queries fall due next round plus {len(never)} "
        f"never-checked exceed two windows — the registry is growing faster "
        f"than the driver can verify; stop adding queries and re-verify."
    )
