"""Sources & sinks (SURVEY.md §2.2): FILE_SCAN, Broker/Stream Load,
INSERT INTO, EXPORT, JDBC.

Doris separates *how bytes arrive* (broker files, HTTP stream-load
batches, Kafka routine load) from *how rows land* (OLAP_TABLE_SINK
applying table-model semantics in a transaction with label-based
idempotency). The Spark-first mapping keeps that split:

- read side: ``spark.read.{csv,json,orc,parquet}`` wrappers
  (:func:`read_file` = FILE_SCAN / BROKER_SCAN),
- write side: :class:`~palo_spark.tables.Table` ``insert`` — the label
  ledger in the table metadata is the Doris load-label dedup,
- :func:`broker_load` composes read → transform → filter → insert in
  one distributed job (the Broker Load shape),
- :func:`export_table` is RESULT_FILE_SINK / EXPORT (``SELECT INTO
  OUTFILE``),
- :func:`jdbc_scan` / :func:`jdbc_sink` wrap the Spark JDBC connector
  (MYSQL/JDBC/ODBC_SCAN + JDBC_TABLE_SINK) — exercised end-to-end
  against embedded Apache Derby, whose driver ships in the Spark
  distribution (``jdbc_roundtrip`` suite entry; swap url/driver for
  MySQL/Postgres on a cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from palo_spark.tables import Table

_FORMATS = ("csv", "json", "parquet", "orc")


def read_file(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    **options,
) -> DataFrame:
    """FILE_SCAN: read external files with an explicitly declared schema.

    Doris file scans are schema-declared (the load statement names the
    columns); passing ``schema`` skips Spark's inference pass — one read
    instead of two, and no type drift between loads.
    """
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {_FORMATS}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        reader = reader.option("inferSchema", "true")
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.options(**options).format(fmt).load(path)


def broker_load(
    spark: SparkSession,
    table: Table,
    path: str,
    fmt: str = "parquet",
    *,
    schema=None,
    transforms: list | None = None,
    where=None,
    label: str | None = None,
    quality_check=None,
    max_filter_ratio: float = 0.0,
    **options,
) -> int:
    """Broker Load: bulk-load files with column transforms and a filter,
    committed under an idempotent label.

    ``read → select(transforms) → filter(where) → Table.insert(label)``
    is one distributed job; re-running the same label is a no-op (the
    Doris label ledger), so a retried load never double-commits.
    Returns the committed version, or -1 if the label was already
    applied.

    ``quality_check`` + ``max_filter_ratio`` implement Doris's load
    quality gate: rows failing ``quality_check`` (a boolean Column) are
    dropped, and the WHOLE load aborts (``ValueError``, nothing
    committed) if the dropped fraction exceeds ``max_filter_ratio`` —
    tolerate a trickle of bad rows, refuse a broken feed. This is
    distinct from ``where``, which is intentional filtering and never
    counts against the ratio (exactly Doris's WHERE-vs-quality split).
    The two counts come from one pass (cached) before the write job.
    """
    df = read_file(spark, path, fmt, schema=schema, **options)
    if transforms:
        df = df.select(*transforms)
    if where is not None:
        df = df.filter(where)
    if quality_check is not None:
        df = df.persist()
        total = df.count()
        good = df.filter(F.coalesce(quality_check, F.lit(False)))
        n_good = good.count()
        bad_ratio = 0.0 if total == 0 else (total - n_good) / total
        if bad_ratio > max_filter_ratio:
            df.unpersist()
            raise ValueError(
                f"load aborted: {bad_ratio:.4f} of rows failed the quality "
                f"check (max_filter_ratio={max_filter_ratio}); nothing committed"
            )
        version = table.insert(good, label=label)
        df.unpersist()
        return version
    return table.insert(df, label=label)


def stream_load(
    table: Table,
    batch_df: DataFrame,
    label: str,
    partial_columns: bool = False,
    merge_type: str = "APPEND",
    delete_on: str | None = None,
) -> int:
    """Stream Load: one micro-batch committed under a mandatory label
    (the HTTP-PUT batch shape — the label is what makes client retries
    safe). ``partial_columns`` mirrors the Doris 2.0 stream-load header
    of the same name: the batch updates only the columns it carries
    (UNIQUE key model; see ``Table.insert``).

    ``merge_type`` mirrors the upstream header [upstream: docs
    data-operate batch-delete]: ``APPEND`` (default) loads rows as-is;
    ``DELETE`` marks EVERY batch row a delete; ``MERGE`` requires
    ``delete_on`` (a boolean SQL expression over the batch columns) and
    stamps the hidden delete-sign from it, so one batch mixes upserts
    and deletes. Sign semantics (sequence-aware merge, compaction
    fold-away) live in ``Table`` — this is just the header-to-column
    translation the upstream FE performs."""
    from palo_spark.tables import DELETE_SIGN_COL

    mt = merge_type.upper()
    if mt not in ("APPEND", "DELETE", "MERGE"):
        raise ValueError("merge_type must be APPEND, DELETE or MERGE")
    if (delete_on is not None) != (mt == "MERGE"):
        raise ValueError("delete_on is required for MERGE and only MERGE")
    if mt == "DELETE":
        batch_df = batch_df.withColumn(DELETE_SIGN_COL, F.lit(1))
    elif mt == "MERGE":
        batch_df = batch_df.withColumn(
            DELETE_SIGN_COL, F.expr(delete_on).cast("int")
        )
    return table.insert(batch_df, label=label, partial_columns=partial_columns)


def insert_into(table: Table, df: DataFrame) -> int:
    """``INSERT INTO t SELECT ...`` — unlabeled append through the
    table-model sink."""
    return table.insert(df)


def export_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    *,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    **options,
) -> None:
    """EXPORT / SELECT INTO OUTFILE: write a result set to files.

    Distributed write — one file per task unless the caller coalesces;
    ``partition_by`` produces directory partitions (partition pruning
    for whoever reads the export back).
    """
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {_FORMATS}")
    writer = df.write.mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)


def jdbc_scan(spark: SparkSession, url: str, table: str, **options) -> DataFrame:
    """MYSQL/JDBC/ODBC_SCAN → Spark JDBC connector (predicate pushdown
    and partitioned reads via the standard ``partitionColumn`` options).
    Exercised end-to-end against embedded Apache Derby (driver ships in
    the Spark distribution) by the ``jdbc_roundtrip`` suite entry and
    tests/test_sources_streaming.py."""
    return spark.read.format("jdbc").option("url", url).option("dbtable", table).options(
        **options
    ).load()


def jdbc_sink(df: DataFrame, url: str, table: str, mode: str = "append", **options) -> None:
    """JDBC_TABLE_SINK → Spark JDBC writer. Exercised end-to-end
    against embedded Apache Derby by the ``jdbc_roundtrip`` entry."""
    df.write.format("jdbc").option("url", url).option("dbtable", table).options(
        **options
    ).mode(mode).save()


def es_scan(
    spark: SparkSession,
    resource: str,
    nodes: str = "localhost:9200",
    query: str | None = None,
    **options,
) -> DataFrame:
    """ES_SCAN → the public Elasticsearch-Hadoop Spark connector
    (``org.elasticsearch.spark.sql``), exactly as SURVEY §2.1 row 4
    prescribes. Filter/column pushdown is the connector's own
    (``es.read.field.include`` + pushdown on the ES query DSL), so a
    selective scan ships the query to ES rather than draining the index.

    The connector jar is not present in this environment — calling this
    without it raises Spark's CLASS_NOT_FOUND for format ``es``; on a
    cluster, add ``org.elasticsearch:elasticsearch-spark-30_2.12`` to
    ``spark.jars.packages`` and this function works unchanged (same
    posture as ``jdbc_scan`` had before Derby was wired in).
    """
    r = spark.read.format("es").option("es.nodes", nodes)
    if query is not None:
        r = r.option("es.query", query)
    return r.options(**options).load(resource)


def create_bucketed_table(
    df: DataFrame,
    name: str,
    key: str | list[str],
    buckets: int = 8,
    *,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed+sorted managed table — the Spark
    analog of Doris's hash-distributed tablets (``DISTRIBUTED BY
    HASH(key) BUCKETS n``).

    Two tables bucketed on the same key with the same bucket count
    join WITHOUT a shuffle: each scan task reads exactly one bucket's
    files per side and the SortMergeJoin runs Exchange-free (pinned by
    ``tests/test_plans.py::test_bucketed_join_has_no_exchange``). At
    100 TB this is the difference between re-shuffling the fact table
    on every join and co-locating it once at write time; aggregations
    keyed on the bucket columns also skip their Exchange.
    """
    import os
    import shutil

    keys = [key] if isinstance(key, str) else list(key)
    spark = df.sparkSession
    # the default in-memory catalog forgets tables across sessions while
    # their warehouse directories persist on disk; clear both so a fresh
    # session can recreate the table (saveAsTable refuses a stale
    # location otherwise: LOCATION_ALREADY_EXISTS). If the catalog still
    # knows the table, drop via its REAL resolved location (covers
    # non-default warehouse layouts); otherwise fall back to the managed
    # path Spark would assign: lowercased name, '<db>.db/<tbl>' for
    # db-qualified names.
    loc = None
    try:
        loc = spark.sql(f"DESCRIBE TABLE EXTENDED {name}").filter(
            "col_name = 'Location'"
        ).collect()
        loc = loc[0]["data_type"] if loc else None
    except Exception:
        pass
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    parts = name.lower().strip("`").split(".")
    rel = parts[-1] if len(parts) == 1 else os.path.join(f"{parts[-2]}.db", parts[-1])
    for cand in filter(None, [loc, os.path.join(wh, rel)]):
        for prefix in ("file://", "file:"):
            if cand.startswith(prefix):
                cand = cand[len(prefix):]
                break
        # only remove paths inside the warehouse this function manages —
        # never an external/pre-existing location
        if os.path.realpath(cand).startswith(
            os.path.realpath(wh.removeprefix("file://").removeprefix("file:"))
        ):
            shutil.rmtree(cand, ignore_errors=True)
    (
        df.write.format("parquet")
        .bucketBy(buckets, keys[0], *keys[1:])
        .sortBy(keys[0], *keys[1:])
        .mode(mode)
        .saveAsTable(name)
    )


# --------------------------------------------------------------------------
# Doris table-valued functions in FROM position ([docs: sql-functions/
# table-functions — local, s3, hdfs, file, numbers]; Doris 2.x load/query
# path `SELECT * FROM S3(...)` / `INSERT INTO t SELECT * FROM local(...)`).
#
# Spark-first mapping: a TVF call site in the SQL *text* is rewritten (once,
# driver-side) into a registered temp view over the matching `spark.read`
# scan, so the tail plan is an ordinary FileScan — pushdown/pruning and the
# 100 TB execution path are identical to a native `FROM` table. `s3()`/
# `hdfs()` pass their URI straight to the Spark reader (on a cluster the
# s3a/hdfs filesystem connector resolves it — exactly how Spark reads S3);
# credential props map onto the standard hadoop-conf keys.

_TVF_CALL_RE_SRC = r"\b(?P<fn>local|file|s3|hdfs|numbers)\s*\("
import re as _re

_TVF_CALL_RE = _re.compile(_TVF_CALL_RE_SRC, _re.IGNORECASE)
_TVF_PROP_RE = _re.compile(
    r"^\s*(?:'(?P<k1>[^']*)'|\"(?P<k2>[^\"]*)\")\s*=\s*"
    r"(?:'(?P<v1>[^']*)'|\"(?P<v2>[^\"]*)\")\s*$"
)

#: s3()/hdfs() credential/endpoint props → hadoop conf keys (the standard
#: spark-on-S3 configuration surface; inert when the connector jar is not
#: on the classpath, e.g. this test box)
_S3_CONF_MAP = {
    "s3.access_key": "fs.s3a.access.key",
    "s3.secret_key": "fs.s3a.secret.key",
    "s3.endpoint": "fs.s3a.endpoint",
    "s3.region": "fs.s3a.endpoint.region",
}


def table_function_read(spark: SparkSession, fn: str, props: dict) -> DataFrame:
    """Execute one Doris TVF (already-parsed ``"k"="v"`` props) as a
    Spark scan. ``numbers`` → ``spark.range``; file TVFs → the format
    reader. CSV without a header names columns ``c1..cN`` (Doris
    convention); ``csv_with_names`` reads the header row."""
    fn = fn.lower()
    props = {k.lower(): v for k, v in props.items()}
    if fn == "numbers":
        cnt = int(props.get("number", "0"))
        df = spark.range(cnt).select(F.col("id").alias("number"))
        if "const_value" in props:
            df = df.select(
                F.lit(int(props["const_value"])).alias("number")
            )
        return df
    path = props.get("file_path") or props.get("uri")
    if not path:
        raise ValueError(
            f"{fn}() needs a 'file_path' (local/file) or 'uri' (s3/hdfs) "
            "property"
        )
    if fn in ("s3", "hdfs"):
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        for k, hk in _S3_CONF_MAP.items():
            if k in props:
                hconf.set(hk, props[k])
    fmt = props.get("format", "csv").lower()
    reader = spark.read
    if fmt in ("csv", "csv_with_names"):
        sep = props.get("column_separator", ",")
        df = reader.options(
            header=str(fmt == "csv_with_names").lower(), sep=sep,
            inferSchema="false",
        ).csv(path)
        if fmt == "csv":
            df = df.toDF(*[f"c{i + 1}" for i in range(len(df.columns))])
        return df
    if fmt == "json":
        return reader.json(path)
    if fmt in ("parquet", "orc"):
        return reader.format(fmt).load(path)
    raise ValueError(f"unsupported TVF format {fmt!r}")


def rewrite_table_functions(
    spark: SparkSession, text: str, extra=None
) -> str:
    """Rewrite every Doris TVF call site in ``text`` into a registered
    temp-view name. A candidate is only treated as a TVF when every
    call argument is a ``"key"="value"`` string-literal pair — the shape
    no scalar-function call shares — so columns or functions that merely
    share a name (``file``, ``s3``) pass through untouched.

    ``extra`` maps additional TVF names to ``callable(props) ->
    DataFrame`` — the hook a session uses for metadata TVFs that need
    session state (Doris ``jobs()`` / ``tasks()``)."""
    extra = extra or {}
    call_re = _TVF_CALL_RE
    if extra:
        call_re = _re.compile(
            r"\b(?P<fn>local|file|s3|hdfs|numbers|"
            + "|".join(_re.escape(k) for k in extra)
            + r")\s*\(",
            _re.IGNORECASE,
        )
    if not call_re.search(text):
        return text
    out: list[str] = []
    i, n = 0, len(text)
    prev = ""  # last non-space char emitted (word-boundary/qualifier guard)
    while i < n:
        ch = text[i]
        if ch in "'\"`":
            j = i + 1
            while j < n and text[j] != ch:
                j += 2 if text[j] == "\\" and ch != "`" else 1
            out.append(text[i : j + 1])
            prev = ch
            i = j + 1
            continue
        # `\b` in the pattern (matched against the ORIGINAL text) already
        # rejects `xlocal(`; the prev guard rejects qualified refs like
        # `db.local(` and backtick-adjacent `` `x`local( ``
        m = call_re.match(text, i)
        if m and prev not in (".", "`"):
            close = _match_call_paren(text, m.end() - 1)
            if close is not None:
                props = _parse_tvf_props(text[m.end() : close])
                # metadata TVFs take zero-or-more props — allow `()`
                if props is None and m.group("fn").lower() in extra \
                        and not text[m.end():close].strip():
                    props = {}
                if props is not None:
                    fn = m.group("fn").lower()
                    if fn in extra:
                        view = f"__tvf_meta_{fn}"
                        extra[fn](props).createOrReplaceTempView(view)
                    else:
                        view = _register_tvf(spark, fn, props)
                    out.append(view)
                    prev = view[-1]
                    i = close + 1
                    continue
        out.append(ch)
        if not ch.isspace():
            prev = ch
        i += 1
    return "".join(out)


def _match_call_paren(text: str, open_i: int) -> int | None:
    depth = 0
    i, n = open_i, len(text)
    while i < n:
        ch = text[i]
        if ch in "'\"`":
            j = i + 1
            while j < n and text[j] != ch:
                j += 2 if text[j] == "\\" and ch != "`" else 1
            i = j + 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    return None


def _parse_tvf_props(arg_text: str) -> dict | None:
    props: dict = {}
    if not arg_text.strip():
        return None
    # split at top-level commas, respecting quotes (props are flat —
    # nested parens mean this is NOT a TVF call)
    args, buf, i, n = [], [], 0, len(arg_text)
    while i < n:
        ch = arg_text[i]
        if ch in "'\"":
            j = i + 1
            while j < n and arg_text[j] != ch:
                j += 2 if arg_text[j] == "\\" else 1
            buf.append(arg_text[i : j + 1])
            i = j + 1
            continue
        if ch == ",":
            args.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
        i += 1
    args.append("".join(buf))
    for a in args:
        pm = _TVF_PROP_RE.match(a)
        if pm is None:
            return None
        k = pm.group("k1") if pm.group("k1") is not None else pm.group("k2")
        v = pm.group("v1") if pm.group("v1") is not None else pm.group("v2")
        props[k] = v
    return props


#: every TVF view ever registered in this process: view name -> (fn,
#: props). Lets a session RE-REGISTER a TVF view before serving a
#: statement that reaches it through a stored body (a session view over
#: a TVF) — the temp view's plan pins the file listing at registration
#: time, so without a refresh a replaced external file crashes the read
#: (FAILED_READ_FILE) or serves stale rows. Names are deterministic
#: content digests, so re-registration is idempotent.
_TVF_REGISTRY: dict[str, tuple[str, dict]] = {}

_TVF_VIEW_RE = _re.compile(r"\b__tvf_\w+\b")


def _register_tvf(spark: SparkSession, fn: str, props: dict) -> str:
    import hashlib

    key = repr((fn.lower(), tuple(sorted(props.items()))))
    view = f"__tvf_{fn.lower()}_{hashlib.md5(key.encode()).hexdigest()[:12]}"
    table_function_read(spark, fn, props).createOrReplaceTempView(view)
    _TVF_REGISTRY[view] = (fn, dict(props))
    return view


def refresh_tvf_views(spark: SparkSession, texts) -> None:
    """Re-register every known TVF view named in any of ``texts`` (the
    statement plus any session-view bodies it reaches): a fresh
    ``spark.read`` re-lists the external files, so mutations under the
    path are visible — Doris TVF semantics are read-at-query-time."""
    seen: set[str] = set()
    for t in texts:
        for v in _TVF_VIEW_RE.findall(t):
            if v in seen:
                continue
            seen.add(v)
            reg = _TVF_REGISTRY.get(v)
            if reg is not None:
                table_function_read(spark, *reg).createOrReplaceTempView(v)
