#!/usr/bin/env python
"""Per-query profiling for the r13 optimization round.

Mirrors bench.py's methodology (same session, same warmups, noop sink,
cache release + GC between queries) but splits each headline entry's
time into:

  t_build — Python-side DataFrame construction (includes any eager
            setup the entry does by design: table-model inserts,
            localCheckpoint materialization, DDL);
  t_plan  — forcing analysis + optimization + physical planning of the
            returned frame (queryExecution().executedPlan());
  t_exec  — the noop-sink write (re-plans the write command, then runs).

Also records plan-shape features (Exchange / python-eval / join node
counts from explain("formatted")) and dumps the formatted plan to
plans/r13/<name>_<tag>.txt.

Usage: python scripts/profile_bench_r13.py [tag] [name_substr ...]
Output: one JSON line per query to stderr, full dict to
        /tmp/profile_r13_<tag>.json
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
PATTERNS = sys.argv[2:]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from palo_spark.session import get_session
    import __spark_entry__ as ent
    from bench import HEADLINE

    spark = get_session("palo_spark-profile")
    qs = ent.queries()
    names = [n for n in HEADLINE if n in qs]
    if PATTERNS:
        names = [n for n in names if any(p in n for p in PATTERNS)]

    spark.range(1000).count()
    from palo_spark.catalog import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def __warm_udf(s):
        return s

    spark.range(1000).select(__warm_udf("id")).write.format("noop").mode(
        "overwrite"
    ).save()
    for name in (
        "rollup_rewrite_hit",
        "text_match_indexed",
        "similarity_search_ivf",
        "sql_ngram_index_like",
    ):
        if name in qs:
            try:
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            except Exception as e:
                print(f"profile: warmup {name} FAILED: {e}", file=sys.stderr)

    from palo_spark.operators import release_persisted

    plans_dir = os.path.join(REPO, "plans", "r13")
    os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(name)
        rec: dict = {}
        try:
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            rec["t_build"] = round(t1 - t0, 3)
            rec["t_plan"] = round(t2 - t1, 3)
            rec["t_exec"] = round(t3 - t2, 3)
            rec["t_total"] = round(t3 - t0, 3)
            try:
                plan = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            except Exception:
                import io
                from contextlib import redirect_stdout

                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                plan = buf.getvalue()
            rec["exchanges"] = len(re.findall(r"\bExchange\b", plan))
            rec["py_eval"] = len(
                re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas", plan)
            )
            rec["smj"] = plan.count("SortMergeJoin")
            rec["bhj"] = plan.count("BroadcastHashJoin")
            rec["bnl"] = plan.count("BroadcastNestedLoopJoin")
            rec["sorts"] = len(re.findall(r"\bSort\b", plan))
            with open(os.path.join(plans_dir, f"{name}_{TAG}.txt"), "w") as fh:
                fh.write(plan)
        except Exception as e:
            rec["error"] = str(e)[:300]
        finally:
            release_persisted()
            spark.catalog.clearCache()
            spark._jvm.System.gc()
            spark.sparkContext.setJobDescription(None)
        out[name] = rec
        print("PROFILE " + json.dumps({name: rec}), file=sys.stderr)

    path = f"/tmp/profile_r13_{TAG}.json"
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    tot = sum(r.get("t_total", 0) for r in out.values())
    print(f"profile: {len(out)} queries, total {tot:.1f}s -> {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
