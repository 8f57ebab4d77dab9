"""Registry-wide single-partition plan sweep (VERDICT r6 advice #2).

The r5→r6 rounds eliminated individual global-window scale-killers
(NTILE deciles, then the exact-percentile shape) case by case; this test
closes the CLASS: every ``queries()`` entry's physical plan is scanned
for a ``Sort`` or ``Window`` node consuming an ``Exchange
SinglePartition`` — the shape where one task sorts/windows the whole
frame, fine at sf0.001 and fatal at 10⁹ rows. Plans are inspected
pre-execution (the initial physical plan), which is data-size
independent — AQE can only coalesce partitions at runtime, never
introduce a new global sort.

Node matching is exact: ``SortAggregate`` above a SinglePartition
exchange is the standard two-phase scalar aggregate (each partition
pre-reduces to ONE row; the single partition merges P rows) and must
NOT count — only genuine ``Sort``/``Window``/``WindowGroupLimit``
nodes do.

Entries in ALLOWLIST have a global window by design over a frame whose
size is bounded by something other than row count; each carries its
bound.
"""

from __future__ import annotations

import json
import os
import re

# name -> why a global sort/window is safe there (the bound that holds
# at any scale factor)
ALLOWLIST = {
    # cumulative revenue per calendar month over a full_outer join of two
    # per-(month) aggregates: the window input is one row per month —
    # bounded by the calendar (~84 rows for the 7-year fixture), never by
    # fact-table rows (suite/tpcds.py, the VERDICT-sanctioned case).
    "tpcds_cumulative_channels": "calendar-bounded: one row per month",
    # global rank over the bm25 retriever's TOP-50 (limit-bounded at any
    # corpus size). Pre-r9 the LIMIT was in the same lazy plan and the
    # planner elided the exchange; with bm25_scores now eager-
    # checkpointing its top_n result (structural cache release), the
    # 50-row checkpoint scan re-ranks through an explicit
    # SinglePartition exchange — same bounded work, now visible.
    "rag_fusion_rrf": "limit-bounded: window input is the bm25 top-50",
}

_NODE = re.compile(r"(?:^|[+:]- )(Sort|Window|WindowGroupLimit)[ \[(]")

# --- plan-shape ceilings (VERDICT r12 advice #5) -------------------------
# The duplicated-subtree class (an operator's interpreted explode/fold
# re-planned under every consuming branch — r12's substring_dup_docs had
# 26 Exchanges / 8 Generates before the fix) was caught by a one-off
# 452-plan scan; this table makes that scan a permanent pin. Counts are
# from the INITIAL physical plan at the pytest fixture SF; regenerate with
#   python scripts/gen_plan_ceilings.py
# whenever entries are added or a shape legitimately changes (and say why
# in the commit).

_SHAPE_PATTERNS = {
    # shuffle exchanges: every "Exchange hashpartitioning/rangepartitioning/
    # SinglePartition/RoundRobin" — NOT BroadcastExchange (counted apart)
    "shuffle_exchange": re.compile(r"(?:^|[+:*!]- )Exchange "),
    "broadcast_exchange": re.compile(r"(?:^|[+:*!]- )BroadcastExchange"),
    # explode fan-outs: a duplicated gram/token subtree shows up here first
    "generate": re.compile(r"(?:^|[+:*!]- )Generate"),
    # the JVM<->Python boundary: row-at-a-time (BatchEvalPython) or Arrow
    # (ArrowEvalPython / *InPandas / ArrowAggregatePython). A pandas kernel
    # silently degrading to BatchEvalPython raises this count's partner.
    "batch_eval_python": re.compile(r"(?:^|[+:*!]- )BatchEvalPython"),
    "arrow_python": re.compile(
        r"(?:^|[+:*!]- )(?:ArrowEvalPython|\w*InPandas|\w*AggregatePython)"
    ),
}


def plan_shape_counts(plan: str) -> dict[str, int]:
    """Count the scale-relevant node classes in a physical-plan string."""
    counts = {}
    for key, pat in _SHAPE_PATTERNS.items():
        counts[key] = sum(1 for line in plan.splitlines() if pat.search(line))
    return counts


_CEILING_PATH = os.path.join(os.path.dirname(__file__), "plan_ceilings.json")


def single_partition_sorts(plan: str) -> list[str]:
    """Lines where a Sort/Window node sits directly above an Exchange
    SinglePartition. Scalar aggregates (HashAggregate/SortAggregate/
    ObjectHashAggregate) over a SinglePartition exchange are fine —
    partial aggregation bounds the exchanged rows at one per partition."""
    lines = plan.splitlines()
    bad = []
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        ctx = "\n".join(lines[max(0, i - 2): i])
        if _NODE.search(ctx):
            bad.append(line.strip())
    return bad


def test_registry_wide_no_single_partition_sort_or_window(spark, sf_dir):
    import palo_spark.suite as suite

    qs = suite.all_queries()
    with open(_CEILING_PATH) as f:
        ceilings: dict[str, dict[str, int]] = json.load(f)
    offenders: dict[str, int] = {}
    over_ceiling: dict[str, str] = {}
    unpinned: list[str] = []
    errors: dict[str, str] = {}
    checked = 0
    for name, fn in qs.items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # surface build failures, don't mask them
            errors[name] = repr(e)[:200]
            continue
        checked += 1
        if name not in ALLOWLIST:
            bad = single_partition_sorts(plan)
            if bad:
                offenders[name] = len(bad)
            # no-cartesian, registry-wide: a CartesianProduct node is the
            # unbounded |A|×|B| pair materialization — never acceptable at
            # scale (BroadcastNestedLoopJoin against a broadcast-bounded
            # side is the legitimate cross-join shape and is NOT flagged).
            # Zero entries plan one as of r7; this keeps it that way.
            if "CartesianProduct" in plan:
                offenders[name] = offenders.get(name, 0) + 1000
        # plan-shape ceiling: counts must never exceed the committed pin
        # (the r13-after shapes) — the duplicated-subtree / dropped-to-
        # BatchEvalPython classes fail here instead of silently shipping.
        ceiling = ceilings.get(name)
        if ceiling is None:
            unpinned.append(name)
            continue
        counts = plan_shape_counts(plan)
        over = {
            k: (counts[k], ceiling.get(k, 0))
            for k in counts
            if counts[k] > ceiling.get(k, 0)
        }
        if over:
            over_ceiling[name] = ", ".join(
                f"{k}: {now} > ceiling {cap}" for k, (now, cap) in over.items()
            )
    assert not errors, f"plan build failed for: {errors}"
    assert not offenders, (
        f"single-partition Sort/Window (the global-window scale-killer) "
        f"or CartesianProduct (counted +1000) re-entered the registry: "
        f"{offenders} — fix the plan or, if the window input is provably "
        f"bounded by something other than row count, add an ALLOWLIST "
        f"entry with the bound"
    )
    assert not unpinned, (
        f"{len(unpinned)} entries have no plan-shape ceiling pin "
        f"({unpinned[:10]}...) — run python scripts/gen_plan_ceilings.py "
        f"and commit tests/plan_ceilings.json"
    )
    assert not over_ceiling, (
        f"plan-shape regression past the committed ceilings "
        f"(tests/plan_ceilings.json): {over_ceiling} — if the new shape is "
        f"deliberate and justified, regenerate with "
        f"scripts/gen_plan_ceilings.py and explain the delta in the commit"
    )
    # the sweep must actually cover the registry (guard against silent
    # collection failures making this vacuously green)
    assert checked >= 300, checked


def test_allowlist_entries_still_exist():
    """An ALLOWLIST name that no longer resolves is stale — remove it so
    the sweep's coverage claim stays honest."""
    import palo_spark.suite as suite

    qs = suite.all_queries()
    missing = [n for n in ALLOWLIST if n not in qs]
    assert not missing, missing
