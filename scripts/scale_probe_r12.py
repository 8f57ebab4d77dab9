"""r12 scale proof-points — one-off measured posture for the round's
new machinery, recorded in SCALE.md.

(a) Join-aware transparent MV rewrite: a covered aggregate over
    fact JOIN dim answered from the snapshot should cost a snapshot
    scan, NOT the defining join — measured by timing the same query
    with the rewrite on (hit) and off (base join) at two fact sizes;
    the hit time should stay ~flat while the base join grows.
(b) Fact-side incremental refresh of a JOIN-body MV: refresh cost
    should be ~linear in STALE fact partitions and ~flat in total
    partition count — measured by touching 1 / 5 / 20 of 20 fact
    partitions and timing REFRESH (dim untouched).

Usage: PYTHONPATH=/root/repo python scripts/scale_probe_r12.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _timeit(fn):
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def probe_join_rewrite(spark):
    from palo_spark.palo_session import PaloSession

    print("== (a) join-rewrite hit vs base join, growing fact ==")
    for mult, n in (("1x", 1_000_000), ("20x", 20_000_000)):
        ps = PaloSession(spark, location_root=tempfile.mkdtemp())
        fact = spark.range(n).select(
            F.col("id").alias("k"),
            (F.col("id") % 5000).alias("c"),
            (F.col("id") * 7 % 1000).alias("amt"),
        )
        dim = spark.range(5000).select(
            F.col("id").alias("c"),
            F.concat(F.lit("g"), (F.col("id") % 25).cast("string")).alias("g"),
        )
        tf = ps._create_table(
            "CREATE TABLE prf (`k` BIGINT, `c` BIGINT, `amt` BIGINT) "
            "DUPLICATE KEY(k) DISTRIBUTED BY HASH(k) BUCKETS 8"
        )
        tf.insert(fact)
        ps._refresh_view("prf")
        td = ps._create_table(
            "CREATE TABLE prd (`c` BIGINT, `g` VARCHAR(8)) "
            "DUPLICATE KEY(c) DISTRIBUTED BY HASH(c) BUCKETS 4"
        )
        td.insert(dim)
        ps._refresh_view("prd")
        ps.sql(
            "CREATE MATERIALIZED VIEW prm BUILD IMMEDIATE REFRESH "
            "COMPLETE ON MANUAL AS SELECT prd.g AS g, SUM(prf.amt) AS s, "
            "COUNT(*) AS n FROM prf JOIN prd ON prf.c = prd.c "
            "GROUP BY prd.g"
        )
        q = ("SELECT prd.g AS g, SUM(prf.amt) AS s FROM prf JOIN prd "
             "ON prf.c = prd.c GROUP BY prd.g")
        # warm once untimed (JIT/codegen), then time the second run
        ps.mv_rewrite_enabled = False
        ps.sql(q).collect()
        base = _timeit(lambda: ps.sql(q).collect())
        ps.mv_rewrite_enabled = True
        ps.sql(q).collect()
        hit = _timeit(lambda: ps.sql(q).collect())
        assert ps.last_mv_rewrite == "prm"
        print(f"  {mult} fact ({n} rows): base join {base}s, "
              f"rewrite hit {hit}s")


def probe_join_incremental(spark):
    from palo_spark.palo_session import PaloSession

    print("== (b) join-MV fact-side incremental refresh vs stale count ==")
    ps = PaloSession(spark, location_root=tempfile.mkdtemp())
    ps.sql(
        "CREATE TABLE pif (`k` BIGINT, `p` BIGINT, `c` BIGINT, "
        "`amt` BIGINT) DUPLICATE KEY(k) AUTO PARTITION BY LIST (`p`) () "
        "DISTRIBUTED BY HASH(k) BUCKETS 4"
    )
    ps.sql("CREATE TABLE pid (`c` BIGINT, `g` VARCHAR(8)) DUPLICATE "
           "KEY(c) DISTRIBUTED BY HASH(c) BUCKETS 4")
    t = ps.tables["pif"]
    t.insert(
        spark.range(500_000).select(
            F.col("id").alias("k"),
            (F.col("id") % 20).alias("p"),
            (F.col("id") % 2000).alias("c"),
            (F.col("id") * 3 % 100).alias("amt"),
        )
    )
    ps._refresh_view("pif")
    ps.tables["pid"].insert(
        spark.range(2000).select(
            F.col("id").alias("c"),
            F.concat(F.lit("g"), (F.col("id") % 25).cast("string")).alias("g"),
        )
    )
    ps._refresh_view("pid")
    ps.sql(
        "CREATE MATERIALIZED VIEW pim BUILD IMMEDIATE REFRESH AUTO "
        "ON MANUAL AS SELECT pid.g AS g, SUM(pif.amt) AS s, COUNT(*) AS n "
        "FROM pif JOIN pid ON pif.c = pid.c GROUP BY pid.g"
    )
    for n_touch in (1, 5, 20):
        for p in range(n_touch):
            ps.sql(f"INSERT INTO pif VALUES (99{p}000, {p}, 7, 1)")
        dt = _timeit(lambda: ps.sql("REFRESH MATERIALIZED VIEW pim"))
        print(f"  {n_touch}/20 fact partitions stale: refresh {dt}s")


def main():
    from palo_spark.session import get_session

    spark = get_session("scale-probe-r12", master="local[32]")
    probe_join_rewrite(spark)
    probe_join_incremental(spark)


if __name__ == "__main__":
    main()
