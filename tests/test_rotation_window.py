"""The driver-window rotation can't go stale (VERDICT r7 advice #3).

The driver's correctness gate verifies the FIRST 50 registry entries
each round; ``palo_spark.suite._PRIORITY`` controls that order.  A
window entry that already has a driver-green CORRECTNESS row wastes a
rotation slot and delays the never-green backlog, so this test asserts
— mechanically, from the checked-in ``CORRECTNESS_r0*.json`` ledger —
that every window entry is either never-green or explicitly listed in
``_RESCHEDULED_OK`` with a reason.

Green rows are counted only from rounds BEFORE ``_WINDOW_ROUND`` (the
round the window was written for): once the window runs, the driver
checks in CORRECTNESS_r{N}.json whose rows are *this window going
green* — including them would retroactively fail the very rotation
they prove.  Bumping _WINDOW_ROUND without rotating _PRIORITY makes
the stale entries visible again, which is the point.
"""

from __future__ import annotations

import glob
import json
import os
import re

from palo_spark.suite import _PRIORITY, _RESCHEDULED_OK, _WINDOW_ROUND, all_queries

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _green_before(round_n: int) -> set[str]:
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m or int(m.group(1)) >= round_n:
            continue
        for name, row in json.load(open(path)).items():
            if not isinstance(row, dict):
                continue
            # the driver emits hash_match=None for rows-only (no-oracle)
            # checks; those still consume the entry's rotation slot
            if row.get("rows_match") and row.get("schema_match") and (
                row.get("hash_match") in (True, None)
            ):
                green.add(name)
    return green


def test_window_entries_exist_in_registry():
    qs = all_queries()
    missing = [n for n in _PRIORITY if n not in qs]
    assert not missing, f"_PRIORITY names not in registry: {missing}"


def test_window_is_not_stale():
    green = _green_before(_WINDOW_ROUND)
    stale = [n for n in _PRIORITY[:50] if n in green and n not in _RESCHEDULED_OK]
    assert not stale, (
        f"window entries already driver-green before r{_WINDOW_ROUND} "
        f"(rotate them out or justify in _RESCHEDULED_OK): {stale}"
    )


def test_rescheduled_entries_are_in_ledger():
    # _RESCHEDULED_OK must name entries that ARE ledger-green — otherwise
    # the exception list itself has gone stale
    green = _green_before(_WINDOW_ROUND)
    bogus = [n for n in _RESCHEDULED_OK if n not in green]
    assert not bogus, f"_RESCHEDULED_OK entries never green anyway: {bogus}"


def test_window_is_full():
    # a short window wastes driver slots; the registry is far larger
    assert len(_PRIORITY) >= 50
    assert len(set(_PRIORITY)) == len(_PRIORITY), "duplicate window entries"
