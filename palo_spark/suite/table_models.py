"""Table-model coverage (SURVEY.md §1.2, §2.1 OLAP_SCAN merge-on-read,
§2.2 OLAP_TABLE_SINK): DUPLICATE / UNIQUE / AGGREGATE KEY semantics via
``palo_spark.tables.Table``.

Each query builds a managed table under ``/tmp/palo_spark_tables/<name>``
from fixture-derived batches (the OLAP_TABLE_SINK write path), then
returns the merge-on-read view; the oracle replays the same insert
sequence in pure SQL (UNION ALL + window / GROUP BY) so DuckDB computes
the expected merged state independently.

Determinism: every batch carries unique keys (pre-aggregated or built
from a unique source key), so UNIQUE latest-wins and AGGREGATE REPLACE
are well-defined; summed doubles go through the ``dsum`` quantization
when more than two addends could meet.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from palo_spark.catalog import load_table
from palo_spark.suite.util import register
from palo_spark.tables import Table

QUERIES: dict = {}
ORACLE: dict = {}
q = register(QUERIES, ORACLE)

_ROOT = f"/tmp/palo_spark_tables_{os.getpid()}"


def _fresh(spark, name, **kw) -> Table:
    loc = os.path.join(_ROOT, name)
    shutil.rmtree(loc, ignore_errors=True)
    os.makedirs(loc, exist_ok=True)
    return Table(spark, name, location=loc, **kw)


@q(
    "table_model_duplicate_append",
    """
    WITH all_rows AS (
        SELECT c_custkey, c_nationkey, c_acctbal FROM customer
        UNION ALL
        SELECT c_custkey, c_nationkey, c_acctbal FROM customer WHERE c_nationkey < 10
    )
    SELECT c_nationkey, COUNT(*) AS n, COUNT(DISTINCT c_custkey) AS n_keys
    FROM all_rows GROUP BY c_nationkey
    """,
)
def table_model_duplicate_append(spark, sf_dir):
    """DUPLICATE KEY: append-only — two inserts of overlapping rows are
    both visible (key = sort order only, no merge)."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    t = _fresh(spark, "dup_append", keys_type="DUPLICATE", key_cols=["c_custkey"])
    t.insert(c)
    t.insert(c.filter(F.col("c_nationkey") < 10))
    return t.read().groupBy("c_nationkey").agg(
        F.count("*").alias("n"), F.countDistinct("c_custkey").alias("n_keys")
    )


@q(
    "table_model_unique_upsert",
    """
    WITH all_v AS (
        SELECT c_custkey, c_name, c_acctbal, c_mktsegment, 1 AS v FROM customer
        UNION ALL
        SELECT c_custkey, c_name, c_acctbal + 1000.0, 'UPD2', 2
        FROM customer WHERE c_custkey % 3 = 0
        UNION ALL
        SELECT c_custkey, c_name, c_acctbal - 500.0, 'UPD3', 3
        FROM customer WHERE c_custkey % 5 = 0
    ), r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY v DESC) AS rn
        FROM all_v
    )
    SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM r WHERE rn = 1
    """,
)
def table_model_unique_upsert(spark, sf_dir):
    """UNIQUE KEY upsert: three load versions; the highest version wins
    per key (merge-on-read row_number over version desc — one key
    shuffle, Doris's exact merge-on-read plan)."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    t = _fresh(spark, "uniq_upsert", keys_type="UNIQUE", key_cols=["c_custkey"])
    t.insert(c)
    t.insert(
        c.filter(F.col("c_custkey") % 3 == 0)
        .withColumn("c_acctbal", F.col("c_acctbal") + 1000.0)
        .withColumn("c_mktsegment", F.lit("UPD2"))
    )
    t.insert(
        c.filter(F.col("c_custkey") % 5 == 0)
        .withColumn("c_acctbal", F.col("c_acctbal") - 500.0)
        .withColumn("c_mktsegment", F.lit("UPD3"))
    )
    return t.read()


@q(
    "table_model_unique_sequence_col",
    """
    WITH r AS (
        SELECT o_custkey, o_orderkey, o_totalprice, o_orderstatus,
               ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey DESC) AS rn
        FROM orders
    )
    SELECT o_custkey, o_orderkey, o_totalprice, o_orderstatus FROM r WHERE rn = 1
    """,
)
def table_model_unique_sequence_col(spark, sf_dir):
    """UNIQUE KEY with a sequence column (Doris
    ``function_column.sequence_col``): all orders loaded in ONE batch;
    in-batch duplicate keys are resolved by the sequence column, keeping
    each customer's highest-numbered order."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    t = _fresh(
        spark,
        "uniq_seq",
        keys_type="UNIQUE",
        key_cols=["o_custkey"],
        sequence_col="o_orderkey",
    )
    t.insert(o)
    return t.read()


@q(
    "table_model_aggregate_merge",
    f"""
    WITH b1 AS (
        SELECT l_suppkey, l_returnflag,
               (CAST(SUM(CAST(FLOOR(l_quantity * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0) AS qty,
               MAX(l_extendedprice) AS max_price,
               MIN(l_discount) AS min_disc,
               MAX(l_linestatus) AS status,
               1 AS v
        FROM lineitem WHERE l_orderkey % 2 = 0 GROUP BY 1, 2
    ), b2 AS (
        SELECT l_suppkey, l_returnflag,
               (CAST(SUM(CAST(FLOOR(l_quantity * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0) AS qty,
               MAX(l_extendedprice) AS max_price,
               MIN(l_discount) AS min_disc,
               MAX(l_linestatus) AS status,
               2 AS v
        FROM lineitem WHERE l_orderkey % 2 = 1 GROUP BY 1, 2
    ), u AS (SELECT * FROM b1 UNION ALL SELECT * FROM b2)
    SELECT l_suppkey, l_returnflag,
           SUM(qty) AS qty,
           MAX(max_price) AS max_price,
           MIN(min_disc) AS min_disc,
           arg_max(status, v) AS status
    FROM u GROUP BY 1, 2
    """,
)
def table_model_aggregate_merge(spark, sf_dir):
    """AGGREGATE KEY: value columns merge per key across loads — SUM /
    MAX / MIN accumulate, REPLACE keeps the latest version's value
    (Doris compaction-as-aggregation). Two batches split by order
    parity; per-batch pre-aggregation keeps keys unique per rowset."""
    li = load_table(spark, sf_dir, "lineitem")

    def batch(pred):
        return (
            li.filter(pred)
            .groupBy("l_suppkey", "l_returnflag")
            .agg(
                (
                    F.sum(
                        F.floor(F.col("l_quantity") * 1e6).cast("decimal(38,0)")
                    ).cast("double")
                    / 1e6
                ).alias("qty"),
                F.max("l_extendedprice").alias("max_price"),
                F.min("l_discount").alias("min_disc"),
                F.max("l_linestatus").alias("status"),
            )
        )

    t = _fresh(
        spark,
        "agg_merge",
        keys_type="AGGREGATE",
        key_cols=["l_suppkey", "l_returnflag"],
        agg_spec={
            "qty": "SUM",
            "max_price": "MAX",
            "min_disc": "MIN",
            "status": "REPLACE",
        },
    )
    t.insert(batch(F.col("l_orderkey") % 2 == 0))
    t.insert(batch(F.col("l_orderkey") % 2 == 1))
    return t.read()


@q(
    "table_model_schema_change",
    """
    WITH all_v AS (
        SELECT c_custkey, c_acctbal, CAST(NULL AS VARCHAR) AS tier, 1 AS v
        FROM customer
        UNION ALL
        SELECT c_custkey, c_acctbal + 100.0, 'GOLD', 2
        FROM customer WHERE c_custkey % 10 = 0
    ), r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY v DESC) AS rn
        FROM all_v
    )
    SELECT c_custkey, c_acctbal,
           CASE WHEN v = 1 THEN 'STANDARD' ELSE tier END AS tier
    FROM r WHERE rn = 1
    """,
)
def table_model_schema_change(spark, sf_dir):
    """Light schema change (Doris ALTER TABLE ADD COLUMN): add a column
    after the first load — metadata only, no rewrite — old rows surface
    the default, a post-change load carries real values, and the UNIQUE
    merge works across the mixed-schema rowsets."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    t = _fresh(spark, "schema_change", keys_type="UNIQUE", key_cols=["c_custkey"])
    t.insert(c)
    t.add_column("tier", "string", default="STANDARD")
    t.insert(
        c.filter(F.col("c_custkey") % 10 == 0)
        .withColumn("c_acctbal", F.col("c_acctbal") + 100.0)
        .withColumn("tier", F.lit("GOLD"))
    )
    return t.read()


@q(
    "table_model_delete_compact",
    """
    WITH all_v AS (
        SELECT c_custkey, c_acctbal, c_mktsegment, 1 AS v FROM customer
        UNION ALL
        SELECT c_custkey, c_acctbal * 2.0, 'DOUBLED', 2
        FROM customer WHERE c_custkey % 4 = 0
    ), r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY v DESC) AS rn
        FROM all_v
    )
    SELECT c_custkey, c_acctbal, c_mktsegment FROM r
    WHERE rn = 1 AND NOT (c_acctbal < 0.0)
    """,
)
def table_model_delete_compact(spark, sf_dir):
    """DELETE + compaction: upsert two versions, delete negative
    balances (predicate delete → storage rewrite), compact to a single
    rowset, read back. The post-compaction view must equal the logical
    merge-then-filter."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    t = _fresh(spark, "del_compact", keys_type="UNIQUE", key_cols=["c_custkey"])
    t.insert(c)
    t.insert(
        c.filter(F.col("c_custkey") % 4 == 0)
        .withColumn("c_acctbal", F.col("c_acctbal") * 2.0)
        .withColumn("c_mktsegment", F.lit("DOUBLED"))
    )
    t.delete_where("c_acctbal < 0.0")
    t.compact()
    assert len(t.meta.rowsets) == 1, "compact must leave exactly one rowset"
    return t.read()


@q(
    "table_model_delete_predicate",
    """
    SELECT c_custkey, c_acctbal, c_mktsegment
    FROM customer WHERE c_mktsegment <> 'BUILDING'
    UNION ALL
    SELECT c_custkey, c_acctbal, c_mktsegment
    FROM customer WHERE c_mktsegment = 'BUILDING' AND c_custkey % 2 = 0
    """,
)
def table_model_delete_predicate(spark, sf_dir):
    """Deferred predicate DELETE (Doris delete-version semantics, the
    100 TB path): delete on a partitioned table is a METADATA write —
    no rowset file is touched (asserted) — applied at read to data
    loaded before the delete only; a load committed AFTER the delete
    re-populates the deleted partition and must be visible."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    t = _fresh(
        spark,
        "del_pred",
        keys_type="DUPLICATE",
        key_cols=["c_custkey"],
        partition_by=["c_mktsegment"],
    )
    t.insert(c)

    def _files():
        out = {}
        for r in t.meta.rowsets:
            for dp, _, fns in os.walk(r["path"]):
                for fn in fns:
                    p = os.path.join(dp, fn)
                    st = os.stat(p)
                    out[p] = (st.st_size, st.st_mtime_ns)
        return out

    before = _files()
    t.delete_where("c_mktsegment = 'BUILDING'")
    assert _files() == before, "deferred DELETE must not touch any rowset file"
    # a load after the delete is NOT subject to the earlier predicate
    t.insert(c.filter((F.col("c_mktsegment") == "BUILDING") & (F.col("c_custkey") % 2 == 0)))
    return t.read()


@q(
    "table_model_auto_partition",
    """
    SELECT strftime(o_orderdate, '%Y-%m') AS ym,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(o_totalprice * 1000000.0) AS DECIMAL(38,0)))
                AS DOUBLE) / 1000000.0 AS revenue
    FROM orders
    WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
    GROUP BY 1
    """,
)
def table_model_auto_partition(spark, sf_dir):
    """AUTO PARTITION BY RANGE (Doris 2.1 auto/dynamic partitioning):
    orders land in a month-partitioned DUPLICATE table (labels created
    implicitly at load), and the scan's range predicate on the time
    column prunes partition DIRECTORIES before any merge — Doris FE
    partition pruning, realized as hive-layout pruning. The pruned-scan
    result must equal DuckDB's plain filter over the raw parquet; the
    physical file-count reduction is pinned by
    tests/test_tables.py::test_auto_partition_scan_prunes_files."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    t = _fresh(
        spark,
        "orders_auto_part",
        keys_type="DUPLICATE",
        key_cols=["o_orderkey"],
        auto_partition=("o_orderdate", "month"),
    )
    t.insert(o)
    from palo_spark.suite.util import dsum

    return (
        t.scan("o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("ym"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            dsum("o_totalprice").alias("revenue"),
        )
    )


@q(
    "table_model_bitmap_union_col",
    """
    SELECT o_orderpriority AS prio,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS ndv_cust,
           TRUE AS hll_ok
    FROM orders
    """
    + " GROUP BY o_orderpriority",
)
def table_model_bitmap_union_col(spark, sf_dir):
    """AGGREGATE table with BITMAP_UNION + HLL_UNION sketch columns
    (Doris's pre-aggregated audience/distinct-count table): two
    overlapping loads of per-priority customer bitmaps/HLLs merge
    state-wise; the exact bitmap NDV is genuine value parity vs
    COUNT(DISTINCT), the HLL column self-checks its error bound."""
    from palo_spark.functions import sketches as SK

    o = load_table(spark, sf_dir, "orders")
    t = _fresh(
        spark,
        "orders_audience",
        keys_type="AGGREGATE",
        key_cols=["prio"],
        agg_spec={"cust_bm": "BITMAP_UNION", "cust_hll": "HLL_UNION"},
    )

    def batch(df):
        return df.groupBy(F.col("o_orderpriority").alias("prio")).agg(
            SK.bitmap_union_of_values("o_custkey").alias("cust_bm"),
            SK.hll_union_agg_values(F.col("o_custkey").cast("string")).alias(
                "cust_hll"
            ),
        )

    # overlapping halves: merge must not double-count shared customers
    t.insert(batch(o.filter(F.col("o_orderkey") % 3 != 0)))
    t.insert(batch(o.filter(F.col("o_orderkey") % 3 != 1)))
    exact = SK.bitmap_count("cust_bm")
    approx = SK.hll_cardinality("cust_hll")
    return t.read().select(
        "prio",
        exact.alias("ndv_cust"),
        (
            F.abs(approx - exact) / F.greatest(exact, F.lit(1)) < 0.15
        ).alias("hll_ok"),
    )


@q(
    "table_model_partition_rollup",
    """
    WITH eff AS (
        SELECT o_orderpriority AS prio,
               CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1000.0
                    ELSE o_totalprice END AS price
        FROM orders
    )
    SELECT prio,
           CAST(SUM(CAST(FLOOR(price * 1000000.0) AS DECIMAL(38,0)))
                AS DOUBLE) / 1000000.0 AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM eff GROUP BY prio
    """,
)
def table_model_partition_rollup(spark, sf_dir):
    """Partition-incremental rollup (Doris partition-level MV refresh):
    a UNIQUE table auto-partitioned by month takes a full load plus an
    UPSERT batch; the rollup refreshes ONLY the partitions whose
    version moved (pinned by tests/test_partition_rollup.py) and its
    merged answer must equal the direct aggregate over the upserted
    state — which the oracle computes from the base rows."""
    from palo_spark.plans import Measure
    from palo_spark.plans.partition_rollup import PartitionRollup

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority", "o_totalprice"
    )
    t = _fresh(
        spark,
        "orders_prollup",
        keys_type="UNIQUE",
        key_cols=["o_orderkey", "o_orderdate"],
        auto_partition=("o_orderdate", "month"),
    )
    t.insert(o)
    roll = PartitionRollup(
        t,
        ["o_orderpriority"],
        [Measure("dsum", "o_totalprice"), Measure("count")],
        store=os.path.join(_ROOT, "orders_prollup_store"),
    )
    roll.read()  # initial build
    t.insert(
        o.filter(F.col("o_orderkey") % 10 == 0).withColumn(
            "o_totalprice", F.col("o_totalprice") + 1000.0
        )
    )
    return roll.read().select(
        F.col("o_orderpriority").alias("prio"),
        F.col("dsum_o_totalprice").alias("revenue"),
        F.col("count_all").cast("bigint").alias("n"),
    )


@q(
    "table_model_partial_update",
    """
    SELECT c_custkey,
           c_name,
           CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 1000.0
                ELSE c_acctbal END AS c_acctbal,
           CASE WHEN c_custkey % 4 = 0 THEN 'PARTIAL2'
                ELSE c_mktsegment END AS c_mktsegment
    FROM customer
    """,
)
def table_model_partial_update(spark, sf_dir):
    """Doris 2.0 partial-column update on the UNIQUE model (stream-load
    ``partial_columns:true``): after a full load, one batch updates ONLY
    ``c_acctbal`` for keys %3==0 and another ONLY ``c_mktsegment`` for
    keys %4==0 — each partial rowset stores just (key, that column), and
    the read resolves latest-wins PER COLUMN, so a key hit by both
    batches takes its balance from one and its segment from the other
    while ``c_name`` always survives from the full load.

    Scale: a partial load writes |keys| x |carried columns| cells — on a
    100-column table updating 1 column writes 1 column, never a row
    rewrite (that is the feature's entire point upstream). The merge
    view stays ONE hash aggregate on the key; per column the argmax over
    (carries-it ? version : -1) is codegen'd expression work. The oracle
    states the same result positionally (each key's final cell values),
    which is exact because double addition is the identical IEEE op in
    both engines. [upstream: docs partial-update; fe load properties
    ``partial_columns``]"""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    t = _fresh(spark, "uniq_partial", keys_type="UNIQUE", key_cols=["c_custkey"])
    t.insert(c)
    t.insert(
        c.filter(F.col("c_custkey") % 3 == 0).select(
            "c_custkey", (F.col("c_acctbal") + 1000.0).alias("c_acctbal")
        ),
        partial_columns=True,
    )
    t.insert(
        c.filter(F.col("c_custkey") % 4 == 0).select(
            "c_custkey", F.lit("PARTIAL2").alias("c_mktsegment")
        ),
        partial_columns=True,
    )
    return t.read()


@q(
    "table_model_delete_sign_merge",
    """
    SELECT c_custkey,
           CASE WHEN c_custkey % 14 = 0 THEN 'BACK' ELSE c_name END AS c_name,
           CASE WHEN c_custkey % 14 = 0 THEN 0.0
                WHEN c_custkey % 5 = 0 AND c_custkey % 7 <> 0
                    THEN c_acctbal + 500.0
                ELSE c_acctbal END AS c_acctbal
    FROM customer
    WHERE c_custkey % 7 <> 0 OR c_custkey % 14 = 0
    """,
)
def table_model_delete_sign_merge(spark, sf_dir):
    """Doris batch delete via MERGE load (hidden ``__DORIS_DELETE_SIGN__``,
    upstream ``merge_type=MERGE ... DELETE ON``): one load mixes deletes
    (sign=1 for keys %7==0) and upserts (bal+500 for keys %5==0 not also
    deleted) in the SAME batch; a later plain upsert resurrects the %14
    subset of the deleted keys. The sign rides the normal UNIQUE merge —
    the key disappears only if the deleting row wins — so batch deletes
    cost exactly one load, no read-modify-write and no per-key delete
    predicates (the scalable upstream path for high-QPS CDC deletes).

    Scale: identical plan to any UNIQUE merge-on-read — one key shuffle,
    the sign filter is a codegen'd predicate after the window. [upstream:
    docs data-operate batch-delete; fe load property ``merge_type``]"""
    from palo_spark.tables import DELETE_SIGN_COL

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    t = _fresh(spark, "uniq_dsign", keys_type="UNIQUE", key_cols=["c_custkey"])
    t.insert(c)
    k = F.col("c_custkey")
    merge = (
        c.filter(k % 7 == 0).select(
            "c_custkey", "c_name", "c_acctbal", F.lit(1).alias(DELETE_SIGN_COL)
        )
    ).unionByName(
        c.filter((k % 5 == 0) & (k % 7 != 0)).select(
            "c_custkey",
            "c_name",
            (F.col("c_acctbal") + 500.0).alias("c_acctbal"),
            F.lit(0).alias(DELETE_SIGN_COL),
        )
    )
    t.insert(merge)
    t.insert(
        c.filter(k % 14 == 0).select(
            "c_custkey",
            F.lit("BACK").alias("c_name"),
            F.lit(0.0).alias("c_acctbal"),
        )
    )
    return t.read()


@q(
    "table_model_partial_update_sequence",
    """
    SELECT c_custkey,
           CASE WHEN c_custkey % 3 = 0 OR c_custkey % 5 = 0 THEN 20
                ELSE 10 END AS seq,
           c_name,
           CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 7777.0
                WHEN c_custkey % 3 = 0 THEN c_acctbal + 1000.0
                ELSE c_acctbal END AS c_acctbal
    FROM customer
    """,
)
def table_model_partial_update_sequence(spark, sf_dir):
    """Doris 2.0 partial-column update COMBINED with sequence_col
    (VERDICT r8 #6 — previously a guard, now a feature): the winner per
    column is the argmax over (carries-it, sequence, version).

    Sequence script over a full load at seq=10: (a) a seq=20 partial
    updates c_acctbal (+1000) for keys %3==0; (b) an OUT-OF-ORDER seq=5
    partial tries to blank c_name for keys %2==0 — it must lose
    everywhere (the feature's reason to exist: late-arriving stale CDC
    rows can't clobber); (c) a second seq=20 partial updates c_acctbal
    (+7777) for keys %5==0 — equal sequence, later version wins where
    both apply. Final state: names untouched, balances from the
    highest-(seq, version) carrying load, merged seq = the winner's.

    Scale: identical plan to the no-sequence partial merge — ONE hash
    aggregate on the key; per column the argmax struct gains two fields
    (sequence before version), still pure codegen'd expression work.
    [upstream: docs partial-update + function_column.sequence_col,
    Doris 2.0 combining both]"""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    t = _fresh(
        spark, "uniq_partial_seq", keys_type="UNIQUE",
        key_cols=["c_custkey"], sequence_col="seq",
    )
    k = F.col("c_custkey")
    t.insert(c.select("c_custkey", F.lit(10).alias("seq"), "c_name", "c_acctbal"))
    t.insert(
        c.filter(k % 3 == 0).select(
            "c_custkey", F.lit(20).alias("seq"),
            (F.col("c_acctbal") + 1000.0).alias("c_acctbal"),
        ),
        partial_columns=True,
    )
    t.insert(
        c.filter(k % 2 == 0).select(
            "c_custkey", F.lit(5).alias("seq"), F.lit("STALE").alias("c_name")
        ),
        partial_columns=True,
    )
    t.insert(
        c.filter(k % 5 == 0).select(
            "c_custkey", F.lit(20).alias("seq"),
            (F.col("c_acctbal") + 7777.0).alias("c_acctbal"),
        ),
        partial_columns=True,
    )
    return t.read()
