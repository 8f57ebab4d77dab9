#!/usr/bin/env python
"""Per-job split for selected bench entries: run each entry once (bench
methodology) and dump every Spark job's duration + call site from the
UI REST API, grouped by the entry name in the job description."""
import json
import os
import sys
import time
import urllib.request

REPO = "/root/repo"
sys.path.insert(0, REPO)

names = sys.argv[1:]

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
from palo_spark.session import get_session
import __spark_entry__ as ent

spark = get_session("palo_spark-jobsplit", extra_confs={"spark.ui.enabled": "true"})
qs = ent.queries()

spark.range(1000).count()
from palo_spark.catalog import TABLES, load_table
for t in TABLES:
    load_table(spark, sf_dir, t).count()
import pandas as pd  # noqa
from pyspark.sql.functions import pandas_udf

@pandas_udf("long")
def __warm_udf(s):
    return s

spark.range(1000).select(__warm_udf("id")).write.format("noop").mode("overwrite").save()
from palo_spark.operators import release_persisted

t_entry = {}
for name in names:
    spark.sparkContext.setJobDescription(f"ENTRY::{name}")
    t0 = time.perf_counter()
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    t_entry[name] = round(time.perf_counter() - t0, 3)
    release_persisted()
    spark.catalog.clearCache()
    spark._jvm.System.gc()
    spark.sparkContext.setJobDescription(None)

ui = spark.sparkContext.uiWebUrl
app_id = spark.sparkContext.applicationId
jobs = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded"))
by_entry = {}
for j in jobs:
    d = j.get("description", "") or ""
    if not d.startswith("ENTRY::"):
        continue
    nm = d[7:]
    dur = None
    try:
        from datetime import datetime
        st = datetime.strptime(j["submissionTime"][:23], "%Y-%m-%dT%H:%M:%S.%f")
        en = datetime.strptime(j["completionTime"][:23], "%Y-%m-%dT%H:%M:%S.%f")
        dur = (en - st).total_seconds()
    except Exception:
        pass
    by_entry.setdefault(nm, []).append(
        (j["jobId"], round(dur, 3) if dur is not None else -1,
         j["name"][:90], j["numTasks"])
    )
for nm in names:
    rows = sorted(by_entry.get(nm, []))
    tot = sum(r[1] for r in rows if r[1] > 0)
    print(f"\n=== {nm}  entry_wall={t_entry.get(nm)}s  jobs={len(rows)} job_time_sum={tot:.3f}s")
    for jid, dur, jn, ntasks in rows:
        print(f"  job {jid:>4} {dur:7.3f}s tasks={ntasks:<5} {jn}")
spark.stop()
