"""Sources/sinks coverage (SURVEY.md §2.1 #2 FILE_SCAN, #5 SCHEMA_SCAN,
#6 META_SCAN; §2.2 Broker Load, EXPORT, MULTI_CAST).

Each load/export query materializes files under
``/tmp/palo_spark_loads/<name>`` (fresh per call) and round-trips them;
the oracle computes the same result straight from the parquet fixtures,
so a bug anywhere in write → read → transform breaks the hash match.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F
from pyspark.sql import types as T

from palo_spark.catalog import TABLES, load_table, register_views
from palo_spark.sources import broker_load, export_table, read_file
from palo_spark.suite.util import dsum, o_dsum, register
from palo_spark.tables import Table

QUERIES: dict = {}
ORACLE: dict = {}
q = register(QUERIES, ORACLE)

_ROOT = f"/tmp/palo_spark_loads_{os.getpid()}"


def _fresh_dir(name: str) -> str:
    d = os.path.join(_ROOT, name)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    return d


_LI_SCHEMA = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_quantity", T.DoubleType()),
    ]
)


@q(
    "file_scan_csv_roundtrip",
    f"""
    SELECT l_returnflag, COUNT(*) AS n, {o_dsum('l_quantity')} AS qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def file_scan_csv_roundtrip(spark, sf_dir):
    """FILE_SCAN (csv): export lineitem columns to CSV, read back with a
    declared schema (no inference pass), aggregate — must equal the
    aggregation over the original parquet."""
    d = _fresh_dir("csv_rt")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )
    export_table(li, d, fmt="csv", header="true")
    back = read_file(spark, d, fmt="csv", schema=_LI_SCHEMA, header="true")
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("n"), dsum("l_quantity").alias("qty")
    )


@q(
    "file_scan_json_orc_roundtrip",
    f"""
    SELECT l_returnflag,
           COUNT(*) AS n_json, COUNT(*) AS n_orc,
           {o_dsum('l_quantity')} AS qty_json, {o_dsum('l_quantity')} AS qty_orc
    FROM lineitem GROUP BY l_returnflag
    """,
)
def file_scan_json_orc_roundtrip(spark, sf_dir):
    """FILE_SCAN (json + orc): the same rows exported to both formats
    must agree with each other and with the parquet original."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )
    dj, do = _fresh_dir("json_rt"), _fresh_dir("orc_rt")
    export_table(li, dj, fmt="json")
    export_table(li, do, fmt="orc")
    j = (
        read_file(spark, dj, fmt="json", schema=_LI_SCHEMA)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_json"), dsum("l_quantity").alias("qty_json"))
    )
    o = (
        read_file(spark, do, fmt="orc")
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_orc"), dsum("l_quantity").alias("qty_orc"))
    )
    return j.join(o, "l_returnflag").select(
        "l_returnflag", "n_json", "n_orc", "qty_json", "qty_orc"
    )


@q(
    "broker_load_label_dedup",
    f"""
    SELECT o_orderstatus, COUNT(*) AS n, {o_dsum('o_totalprice')} AS total
    FROM orders WHERE o_totalprice > 1000.0 GROUP BY o_orderstatus
    """,
)
def broker_load_label_dedup(spark, sf_dir):
    """Broker Load with label idempotency: the same file loaded twice
    under one label lands exactly once (read → transform → WHERE →
    table-sink, Doris's load pipeline shape)."""
    src = _fresh_dir("broker_src")
    orders = load_table(spark, sf_dir, "orders")
    export_table(orders, src, fmt="parquet")

    loc = _fresh_dir("broker_tbl")
    t = Table(spark, "broker_orders", "DUPLICATE", ["o_orderkey"], location=loc)
    for _ in range(2):  # second call must be a no-op (same label)
        broker_load(
            spark,
            t,
            src,
            fmt="parquet",
            transforms=["o_orderkey", "o_orderstatus", "o_totalprice"],
            where=F.col("o_totalprice") > 1000.0,
            label="load-orders-1",
        )
    return t.read().groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), dsum("o_totalprice").alias("total")
    )


@q(
    "export_partitioned_roundtrip",
    """
    SELECT c_nationkey, COUNT(*) AS n, MAX(c_acctbal) AS max_bal
    FROM customer WHERE c_acctbal > 0.0 GROUP BY c_nationkey
    """,
)
def export_partitioned_roundtrip(spark, sf_dir):
    """EXPORT partitioned by a column, then read back through partition
    discovery — directory partitioning is what gives partition pruning
    to downstream readers."""
    d = _fresh_dir("export_part")
    cu = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0.0)
    export_table(cu, d, fmt="parquet", partition_by=["c_nationkey"])
    back = read_file(spark, d, fmt="parquet")
    return back.groupBy("c_nationkey").agg(
        F.count("*").alias("n"), F.max("c_acctbal").alias("max_bal")
    )


@q(
    "multi_cast_cte_reuse",
    f"""
    WITH big AS (SELECT * FROM orders WHERE o_totalprice > 100000.0)
    SELECT 'by_status' AS side, o_orderstatus AS k, COUNT(*) AS n,
           {o_dsum('o_totalprice')} AS total
    FROM big GROUP BY o_orderstatus
    UNION ALL
    SELECT 'by_priority', o_orderpriority, COUNT(*), {o_dsum('o_totalprice')}
    FROM big GROUP BY o_orderpriority
    """,
)
def multi_cast_cte_reuse(spark, sf_dir):
    """MULTI_CAST_DATA_STREAM_SINK: one producer feeding two consumers —
    ``.cache()`` on the shared subplan (Doris materializes the CTE once;
    Spark caches the first computation and both branches reuse it)."""
    o = load_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 100000.0).cache()
    by_status = big.groupBy(F.col("o_orderstatus").alias("k")).agg(
        F.count("*").alias("n"), dsum("o_totalprice").alias("total")
    )
    by_prio = big.groupBy(F.col("o_orderpriority").alias("k")).agg(
        F.count("*").alias("n"), dsum("o_totalprice").alias("total")
    )
    return by_status.select(F.lit("by_status").alias("side"), "k", "n", "total").unionAll(
        by_prio.select(F.lit("by_priority").alias("side"), "k", "n", "total")
    )


@q(
    "schema_scan_tables",
    """
    SELECT unnest(['region','nation','customer','supplier','part','orders',
                   'lineitem','events','documents','embeddings']) AS table_name
    """,
)
def schema_scan_tables(spark, sf_dir):
    """SCHEMA_SCAN (information_schema.tables): the catalog's table list
    as a DataFrame. Metadata is driver-side by nature (exactly as
    Doris's FE serves it) — the *result* is what's contractual."""
    register_views(spark, sf_dir)
    names = [t.name for t in spark.catalog.listTables() if t.name in TABLES]
    return spark.createDataFrame([(n,) for n in sorted(names)], "table_name string")


@q(
    "meta_scan_columns",
    """
    SELECT 'lineitem' AS table_name, unnest([
        'l_orderkey','l_partkey','l_suppkey','l_linenumber','l_quantity',
        'l_extendedprice','l_discount','l_tax','l_returnflag','l_linestatus',
        'l_shipdate']) AS column_name
    UNION ALL
    SELECT 'events', unnest(['event_id','ts','user_id','event_type','value','props'])
    """,
)
def meta_scan_columns(spark, sf_dir):
    """META_SCAN / information_schema.columns: per-table column metadata
    served from the catalog (parquet footers), no data scan."""
    rows = []
    for t in ("lineitem", "events"):
        for f in load_table(spark, sf_dir, t).schema.fields:
            rows.append((t, f.name))
    return spark.createDataFrame(rows, "table_name string, column_name string")


@q(
    "bucketed_colocated_join",
    f"""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {__import__("palo_spark.suite.util", fromlist=["o_dsum"]).o_dsum("o.o_totalprice")} AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    """,
)
def bucketed_colocated_join(spark, sf_dir):
    """Doris ``DISTRIBUTED BY HASH(key) BUCKETS n`` analog: customer and
    orders written bucketed+sorted on the customer key, then joined —
    bucketed scans feed the SortMergeJoin with NO shuffle on either side
    (Exchange-free plan pinned by tests/test_plans.py::
    test_bucketed_join_has_no_exchange; here the values are
    oracle-checked against the plain parquet join). The write cost is
    paid once at load; every subsequent join/agg on the bucket key
    rides it."""
    from palo_spark.sources import create_bucketed_table
    from palo_spark.suite.util import dsum

    create_bucketed_table(
        load_table(spark, sf_dir, "customer"), "bkt_customer", "c_custkey", 8
    )
    create_bucketed_table(
        load_table(spark, sf_dir, "orders"), "bkt_orders", "o_custkey", 8
    )
    c = spark.table("bkt_customer")
    o = spark.table("bkt_orders")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
    )


@q(
    "jdbc_roundtrip",
    """
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    """,
)
def jdbc_roundtrip(spark, sf_dir):
    """MYSQL/JDBC_SCAN + JDBC_TABLE_SINK exercised end-to-end against a
    REAL database over JDBC: embedded Apache Derby (its driver ships in
    the Spark distribution, so this runs in any stock Spark env). The
    nation dimension is written through the JDBC sink (overwrite =
    drop/recreate, Doris's external-table write), then read back through
    the JDBC scan; values must equal the parquet source. On a cluster
    the same two calls speak to MySQL/Postgres — only url/driver change;
    partitioned parallel reads via the standard partitionColumn options.

    The Derby path is keyed by (sf_dir, pid): embedded Derby holds a
    SINGLE-process lock on its database directory, so two concurrent
    verification runs (pytest's embedded sweep + a standalone
    check_parity) sharing one path would deadlock each other — a
    harness artifact a per-process path removes entirely.
    """
    import hashlib
    import os

    from palo_spark.sources import jdbc_scan, jdbc_sink

    url = (
        "jdbc:derby:/tmp/palo_spark_derby_"
        + hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        + f"_{os.getpid()};create=true"
    )
    drv = "org.apache.derby.jdbc.EmbeddedDriver"
    jdbc_sink(
        load_table(spark, sf_dir, "nation"), url, "nation_rt",
        mode="overwrite", driver=drv,
    )
    return jdbc_scan(spark, url, "nation_rt", driver=drv).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
