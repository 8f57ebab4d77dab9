"""bench.py HEADLINE ↔ registry consistency (VERDICT r8 advice #4).

``bench.py::HEADLINE`` is hand-maintained; a typo'd name would silently
drop a headline query (``names = [n for n in HEADLINE if n in qs]``),
shrinking the bench without any error. And the driver parses only a
2,000-char stdout tail, so the compact JSON line must stay under 1,900
chars as HEADLINE grows — r8 fixed this by construction (greedy
truncation at 1,800), which this test re-proves against the CURRENT
headline list under worst-case serialized timings.
"""

from __future__ import annotations

import json

from bench import HEADLINE


def test_every_headline_name_resolves_in_registry():
    from palo_spark.suite import all_queries

    qs = all_queries()
    missing = [n for n in HEADLINE if n not in qs]
    assert not missing, f"bench HEADLINE names not in registry: {missing}"


def test_headline_has_no_duplicates():
    assert len(set(HEADLINE)) == len(HEADLINE)


def test_compact_stdout_line_bounded_under_tail_limit():
    # replicate bench.main()'s compact-line construction with the
    # widest plausible serialization: every query succeeds with a
    # 4-digit-seconds timing (xxxx.xxx — wider than anything a 0.2-4s
    # sf0.1 entry produces), so if THIS stays under the limit the real
    # line does too
    timings = {n: 1234.567 for n in HEADLINE}
    compact_queries: dict[str, float] = {}
    compact = {
        "metric": "wall_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": compact_queries,
        "sf": 0.1,
        "n": len(HEADLINE),
        "n_failed": 0,
    }
    for name, t in sorted(timings.items(), key=lambda kv: -kv[1]):
        compact_queries[name] = t
        if len(json.dumps(compact)) > 1800:
            del compact_queries[name]
            break
    line = json.dumps(compact)
    assert len(line) <= 1900, f"compact bench line would overflow: {len(line)}"
    # the greedy loop must still leave room for a useful number of
    # slowest-query entries, not degenerate to an empty dict
    assert len(compact_queries) >= 10
