"""The driver-window rotation can't go stale (VERDICT r7 advice #3;
re-armed as a STALENESS rotation in r11 per VERDICT r10 advice #2).

The driver's correctness gate verifies the FIRST 50 registry entries
each round; ``palo_spark.suite._PRIORITY`` controls that order.  The
never-green backlog drained to zero in r10, so from r11 on the window
re-verifies the LEAST-RECENTLY-driver-checked entries: for each
registry entry, its last green round in the checked-in
``CORRECTNESS_r01..r{_WINDOW_ROUND-1}`` ledger (0 if never green —
brand-new entries sort first automatically), ascending, name as the
tie-break.  ``_PRIORITY`` is pinned statically for deterministic
driver order; this test RECOMPUTES the rule from the ledger and
asserts the pin matches, so adding a suite entry or a new ledger file
without re-pinning the window fails loudly.

Last-green rounds are computed only from rounds BEFORE
``_WINDOW_ROUND`` (the round the window was written for): once the
window runs, the driver checks in CORRECTNESS_r{N}.json whose rows are
*this window going green* — including them would retroactively fail
the very rotation they prove.  Bumping _WINDOW_ROUND without re-pinning
_PRIORITY makes any staleness drift visible again, which is the point.
"""

from __future__ import annotations

import glob
import json
import os
import re

from palo_spark.suite import _PRIORITY, _WINDOW_ROUND, all_queries

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _last_green_before(round_n: int) -> dict[str, int]:
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m or int(m.group(1)) >= round_n:
            continue
        rn = int(m.group(1))
        for name, row in json.load(open(path)).items():
            if not isinstance(row, dict):
                continue
            # the driver emits hash_match=None for rows-only (no-oracle)
            # checks; those still count as driver evidence for freshness
            if row.get("rows_match") and row.get("schema_match") and (
                row.get("hash_match") in (True, None)
            ):
                last[name] = max(last.get(name, 0), rn)
    return last


def test_window_entries_exist_in_registry():
    qs = all_queries()
    missing = [n for n in _PRIORITY if n not in qs]
    assert not missing, f"_PRIORITY names not in registry: {missing}"


def test_window_is_the_stalest_50():
    """The pinned window must equal the rule's output: the 50 least-
    recently-driver-green registry entries (never-green first), sorted
    by (last_green_round, name)."""
    last = _last_green_before(_WINDOW_ROUND)
    qs = list(all_queries())
    expected = sorted(qs, key=lambda n: (last.get(n, 0), n))[:50]
    assert _PRIORITY == expected, (
        "window is not the 50 stalest entries — re-pin _PRIORITY "
        f"(and bump _WINDOW_ROUND if rotating):\n"
        f"  missing from window: {[n for n in expected if n not in _PRIORITY]}\n"
        f"  should not be in window: {[n for n in _PRIORITY if n not in expected]}"
    )


def test_window_is_full():
    # a short window wastes driver slots; the registry is far larger
    assert len(_PRIORITY) >= 50
    assert len(set(_PRIORITY)) == len(_PRIORITY), "duplicate window entries"
