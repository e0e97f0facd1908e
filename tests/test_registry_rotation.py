"""Guard against driver-window coverage drift.

The driver hash-verifies only the FIRST 50 registry entries per round, so
the registry ordering in ``plans/all.py`` is part of the evidence plan.
Round 2's hand-maintained rotation plan went stale (claimed 40
never-checked queries; the true set-diff was 54), which would have left
14 oracle-backed queries silently unverified.  This test recomputes the
never-checked set from the actual ``CORRECTNESS_r*.json`` artifacts at the
repo root and fails if the current window would leave an oracle-backed
never-checked query outside the first 50 slots.
"""

from __future__ import annotations

import glob
import json
import os

from split_kinesis_streams_with_glue_spark.plans.all import all_queries

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def _checked_queries() -> set[str]:
    checked: set[str] = set()
    for path in glob.glob(os.path.join(REPO_ROOT, "CORRECTNESS_r*.json")):
        with open(path) as fh:
            checked.update(json.load(fh).keys())
    return checked


def _current_round() -> int:
    rounds = [
        int(os.path.basename(p)[len("CORRECTNESS_r") : -len(".json")])
        for p in glob.glob(os.path.join(REPO_ROOT, "CORRECTNESS_r*.json"))
    ]
    return max(rounds, default=0) + 1


def test_every_oracle_backed_unchecked_query_is_inside_the_driver_window():
    reg = all_queries()
    checked = _checked_queries()
    if not checked:  # fresh clone without driver artifacts — nothing to assert
        return
    order = list(reg)
    window = set(order[:WINDOW])
    never = [n for n in order if n not in checked]
    # a query REGISTERED this round may wait one round for a slot (it has
    # never had the chance); anything older must be inside the window
    this_round = _current_round()
    stranded = [
        n
        for n in never
        if reg[n].oracle is not None
        and n not in window
        and reg[n].since < this_round
    ]
    assert not stranded, (
        f"{len(stranded)} oracle-backed never-driver-checked queries sit past "
        f"slot {WINDOW} and would go another round without a CORRECTNESS row: "
        f"{stranded}. Regenerate _VERIFY_PRIORITY in plans/all.py from the "
        f"set-diff against CORRECTNESS_r*.json."
    )


def test_never_checked_queries_are_frontloaded_before_already_green_ones():
    """No already-verified query may occupy a window slot while ANY
    never-checked query (oracle-backed or rows-only) waits outside it.

    Queries registered THIS round (``since == current round``) are exempt,
    mirroring the first test: brand-new queries may wait one round for a
    slot, so their presence outside the window does not turn the window's
    staleness re-verifications into squatters.
    """
    reg = all_queries()
    checked = _checked_queries()
    if not checked:
        return
    order = list(reg)
    this_round = _current_round()
    waiting_outside = [
        n for n in order[WINDOW:] if n not in checked and reg[n].since < this_round
    ]
    if not waiting_outside:
        return
    squatters = [n for n in order[:WINDOW] if n in checked]
    assert not squatters, (
        f"window slots are occupied by already-driver-green queries "
        f"{squatters} while never-checked queries {waiting_outside} wait "
        f"outside the window"
    )
