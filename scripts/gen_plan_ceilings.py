"""Generate tests/plan_ceilings.json — the per-entry plan-shape ceiling table.

VERDICT r12 advice #5: the duplicated-subtree class (an operator's
interpreted explode/fold re-planned under every consuming branch) was
found by a one-off 452-plan scan in r12; this makes that scan a
permanent pin. For every ``queries()`` entry we record how many
Exchange, Generate, and Python-eval nodes its INITIAL physical plan
contains at sf0.001 (the pytest fixture scale); the committed table is
the ceiling ``tests/test_plan_sweep.py`` asserts against, so a
regression that re-duplicates a subtree (or drops a pandas kernel to a
row-at-a-time BatchEvalPython) fails CI instead of silently shipping.

Run from the repo root whenever entries are added or a plan shape
legitimately changes::

    python scripts/gen_plan_ceilings.py

The counters live in tests/test_plan_sweep.py (``plan_shape_counts``)
so generator and checker can never disagree.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

SF_DIR = os.environ.get("PALO_SPARK_TEST_SF", "/root/testdata/sf0.001")
OUT = os.path.join(REPO, "tests", "plan_ceilings.json")


def main() -> None:
    from test_plan_sweep import plan_shape_counts

    import palo_spark.suite as suite
    from palo_spark.session import get_session

    spark = get_session("gen-plan-ceilings", master="local[8]")
    qs = suite.all_queries()
    table: dict[str, dict[str, int]] = {}
    errors: dict[str, str] = {}
    for name, fn in sorted(qs.items()):
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            errors[name] = repr(e)[:200]
            continue
        table[name] = plan_shape_counts(plan)
    if errors:
        raise SystemExit(f"plan build failed for: {errors}")
    with open(OUT, "w") as f:
        json.dump(table, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {OUT}: {len(table)} entries")


if __name__ == "__main__":
    main()
