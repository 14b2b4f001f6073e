"""Driver-window rotation SLA — self-verifying from committed
artifacts (round-8 verdict item 6: the policy must be checkable, not
re-derived). Reads every committed CORRECTNESS_r*.json and asserts the
registry ordering honors the written-down policy in
plans/inventory.py::_PRIORITY."""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def _newest_driver_round() -> dict[str, int]:
    newest: dict[str, int] = {}
    for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r0*(\d+)", os.path.basename(f)).group(1))
        for q in json.load(open(f)):
            newest[q] = max(newest.get(q, 0), rnd)
    return newest


def test_never_driver_tested_queries_lead_the_window():
    """Every registered query with NO driver CORRECTNESS row in any
    committed round must sit inside the next window (first 50 slots) —
    they are infinitely stale by policy. If a round ever registers
    more than 50 new queries, the window must consist entirely of
    them (the spill is documented in _PRIORITY and leads next round)."""
    from realtime0523_spark.plans.inventory import queries

    names = list(queries())
    newest = _newest_driver_round()
    never = [n for n in names if n not in newest]
    window = set(names[:WINDOW])
    if len(never) <= WINDOW:
        missing = [n for n in never if n not in window]
        assert not missing, (
            f"never-driver-tested queries outside the {WINDOW}-slot "
            f"window: {missing}"
        )
    else:
        assert all(n in never for n in names[:WINDOW])


def test_dated_window_slots_are_stalest_first():
    """Among DATED rows (queries with at least one driver CORRECTNESS
    round), no query outside the window may be STALER than the
    window's stalest dated slot. Changed-code queries legitimately
    re-enter the window carrying latest-round rows (rule 1 preempts
    staleness), so slots dated at the newest committed round are
    excluded from the bound — what remains catches the real failure
    mode: forgetting to rotate an old row in."""
    from realtime0523_spark.plans.inventory import queries

    names = list(queries())
    newest = _newest_driver_round()
    if not newest:
        return  # round 1: no committed driver artifacts yet
    latest = max(newest.values())
    inside = [
        newest[n] for n in names[:WINDOW] if n in newest and newest[n] != latest
    ]
    outside = [newest[n] for n in names[WINDOW:] if n in newest]
    if inside and outside:
        assert min(outside) >= min(inside), (
            f"a query outside the window (newest driver row r{min(outside)}) "
            f"is staler than the window's stalest dated slot "
            f"(r{min(inside)}) — rotate it in"
        )
