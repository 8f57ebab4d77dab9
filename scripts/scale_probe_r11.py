"""r11 scale proof-points (VERDICT r10 advice #5) — one-off measured
posture for the r10 routes, recorded in SCALE.md.

(a) NGRAM_BF probe read cost vs corpus size: the indexed LIKE read
    should scale with posting-bucket count + match count, NOT corpus
    bytes — measured by timing the indexed probe and the full-scan
    LIKE on a 1x and a 10x synthetic corpus (index build untimed, the
    load-path posture).
(b) Partition-incremental async-MV refresh cost vs changed-partition
    fraction: refresh time should be ~linear in STALE bytes and ~flat
    in total partition count — measured by touching 1 / 5 / 20 of 20
    partitions and timing REFRESH.

Usage: python scripts/scale_probe_r11.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _timeit(fn):
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def probe_ngram(spark):
    from palo_spark.palo_session import PaloSession

    print("== (a) NGRAM_BF probe vs corpus size ==")
    words = [
        "merge", "part", "table", "query", "window", "scan", "join",
        "spark", "doris", "index", "gram", "probe", "rowset", "label",
    ]
    out = {}
    for mult, n in (("1x", 20_000), ("10x", 200_000)):
        docs = (
            spark.range(n)
            .select(
                F.col("id").alias("doc_id"),
                F.concat_ws(
                    " ",
                    *[
                        F.element_at(
                            F.array(*[F.lit(w) for w in words]),
                            ((F.xxhash64("id", F.lit(i)) % 14 + 14) % 14 + 1)
                            .cast("int"),
                        )
                        for i in range(12)
                    ],
                ).alias("text"),
            )
        )
        ps = PaloSession(spark)
        ps.sql(f"DROP TABLE IF EXISTS ngp_{mult}")
        t = ps._create_table(
            f"CREATE TABLE ngp_{mult} (`doc_id` BIGINT, `text` STRING) "
            "DUPLICATE KEY(doc_id) DISTRIBUTED BY HASH(doc_id) BUCKETS 8"
        )
        t.insert(docs)
        ps._refresh_view(f"ngp_{mult}")
        # warm the scan (parquet footers, codegen) so timings compare
        # plan+execute, not first-touch
        ps.sql(f"SELECT count(*) AS n FROM ngp_{mult}").collect()
        q = (f"SELECT count(*) AS n FROM ngp_{mult} "
             "WHERE `text` LIKE '%merge part%'")
        # full-scan twin measured BEFORE the index exists
        full = _timeit(lambda: ps.sql(q).collect())
        assert not ps.last_like_indexed
        build = _timeit(lambda: ps.sql(
            f"CREATE INDEX ngp_{mult}_ix ON ngp_{mult} (text) USING "
            "NGRAM_BF PROPERTIES('gram_size'='3', 'bf_size'='256')"
        ))
        indexed = _timeit(lambda: ps.sql(q).collect())
        assert ps.last_like_indexed
        out[mult] = (build, indexed, full)
        print(f"  {mult} ({n} docs): index build {build}s, "
              f"indexed probe {indexed}s, full-scan LIKE {full}s")
    g_probe = out["10x"][1] / out["1x"][1]
    g_full = out["10x"][2] / out["1x"][2]
    print(f"  growth at 10x corpus: indexed probe {g_probe:.1f}x, "
          f"full scan {g_full:.1f}x")
    return out


def probe_mv_refresh(spark):
    from palo_spark.palo_session import PaloSession

    print("== (b) partition-incremental MV refresh vs changed fraction ==")
    ps = PaloSession(spark)
    ps.sql("DROP TABLE IF EXISTS mvp")
    ps.sql(
        "CREATE TABLE mvp (`k` BIGINT, `d` DATETIME, `v` BIGINT) "
        "DUPLICATE KEY(k, d) AUTO PARTITION BY RANGE "
        "(date_trunc(`d`, 'month')) () "
        "DISTRIBUTED BY HASH(k) BUCKETS 4"
    )
    # 20 monthly partitions x 25k rows
    base = (
        spark.range(500_000)
        .select(
            F.col("id").alias("k"),
            F.expr(
                "timestampadd(MONTH, CAST(id % 20 AS INT), "
                "timestamp'2023-01-15 00:00:00')"
            ).alias("d"),
            (F.col("id") % 997).alias("v"),
        )
    )
    ps.tables["mvp"].insert(base)
    ps._refresh_view("mvp")
    ps.sql(
        "CREATE MATERIALIZED VIEW mvp_mv BUILD IMMEDIATE REFRESH AUTO "
        "ON MANUAL AS SELECT k, SUM(v) AS sv FROM mvp GROUP BY k"
    )
    results = {}
    for label, months in (("1/20", [0]), ("5/20", [1, 2, 3, 4, 5]),
                          ("20/20", list(range(20)))):
        rows = []
        for m in months:
            rows.append((1_000_000 + m, f"2023-{(m % 12) + 1:02d}-20 00:00:00"
                         if m < 12 else f"2024-{(m - 12) + 1:02d}-20 00:00:00",
                         m))
        df = spark.createDataFrame(rows, "k long, d string, v long").select(
            "k", F.col("d").cast("timestamp").alias("d"), "v")
        ps.tables["mvp"].insert(df)
        ps._refresh_view("mvp")
        secs = _timeit(lambda: ps.sql("REFRESH MATERIALIZED VIEW mvp_mv"))
        results[label] = secs
        print(f"  {label} partitions stale: refresh {secs}s")
    return results


def main():
    from palo_spark.session import get_session

    spark = get_session("palo_spark-scaleprobe")
    probe_ngram(spark)
    probe_mv_refresh(spark)


if __name__ == "__main__":
    main()
