"""Continuous ingestion (SURVEY.md §2.7, §3.3): the Routine Load /
Stream Load equivalents on Structured Streaming.

Doris's "streaming" is continuous *ingestion* with exactly-once
commits (Kafka offsets recorded in the load transaction), not stream
processing. The Spark-first construction is identical in shape:

- source: ``readStream`` (file source here — Kafka isn't in this
  environment; swapping ``format("kafka")`` changes nothing below),
- commit: ``foreachBatch`` → ``Table.insert(label=batch-<id>)``.
  Exactly-once = Structured Streaming's checkpoint (which batch ids
  ran) × the table's label ledger (a replayed batch id is a no-op) —
  the same two-sided construction as Doris's txn-recorded offsets.

Beyond parity, Spark gives real stream processing free — watermarked
tumbling windows (:func:`windowed_counts`) are exposed as an engine
extension (marked as such; the reference has no event-time semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from palo_spark.tables import Table


def routine_load(
    spark: SparkSession,
    source_path: str,
    schema,
    table: Table,
    checkpoint_dir: str,
    *,
    fmt: str = "parquet",
    transform=None,
    await_termination: bool = True,
):
    """Routine-Load equivalent: continuously consume files appearing
    under ``source_path`` into ``table`` with exactly-once semantics.

    Runs with ``availableNow`` trigger (drain what exists, then stop) —
    a production deployment drops that trigger and the same code runs
    forever. Returns the StreamingQuery.
    """
    src = spark.readStream.schema(schema).format(fmt).load(source_path)
    if transform is not None:
        src = transform(src)
    return _commit_stream(src, table, checkpoint_dir, await_termination)


def _commit_stream(
    src: DataFrame, table: Table, checkpoint_dir: str, await_termination: bool
):
    def commit(batch_df: DataFrame, batch_id: int) -> None:
        # label = deterministic function of the batch id: a restarted
        # query that replays batch N hits the label ledger and no-ops.
        table.insert(batch_df, label=f"routine-{table.meta.name}-{batch_id}")

    q = (
        src.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def parse_kafka_value(src: DataFrame, value_format: str, value_schema) -> DataFrame:
    """Doris routine-load column extraction over the Kafka record shape
    (``key binary, value binary, topic, partition, offset, timestamp,
    timestampType``): decode ``value`` per the declared format into
    typed columns. Shared verbatim by :func:`kafka_routine_load` and the
    file-source test path, so the parse logic is exercised without a
    Kafka broker. Unparseable records yield NULL columns (Doris
    max_error_number posture: tolerate, don't abort) — filter with a
    ``transform`` if stricter handling is needed.
    """
    value_format = value_format.lower()
    s = F.col("value").cast("string")
    if value_format == "json":
        return src.select(F.from_json(s, value_schema).alias("__v")).select("__v.*")
    if value_format == "csv":
        return src.select(F.from_csv(s, value_schema).alias("__v")).select("__v.*")
    raise ValueError(f"unsupported routine-load value format {value_format!r}")


def kafka_routine_load(
    spark: SparkSession,
    *,
    bootstrap_servers: str,
    topic: str,
    value_schema,
    table: Table,
    checkpoint_dir: str,
    value_format: str = "json",
    starting_offsets: str = "earliest",
    transform=None,
    await_termination: bool = True,
):
    """Routine Load from Kafka (Doris ``CREATE ROUTINE LOAD ... FROM
    KAFKA``): consume ``topic``, decode each record's ``value`` as
    ``value_format`` (json/csv) into ``value_schema`` columns, commit
    batches into ``table`` with the same exactly-once construction as
    :func:`routine_load` (checkpointed Kafka offsets × label ledger —
    Doris records offsets in the load txn; this is the same two-sided
    idempotency).

    Requires the ``spark-sql-kafka`` connector jar on the classpath
    (absent in this environment — ``.load()`` raises
    ``DATA_SOURCE_NOT_FOUND`` here; the full parse→commit path below the
    source is exercised by tests through :func:`parse_kafka_value` over
    a file source with Kafka-shaped records).
    """
    src = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    parsed = parse_kafka_value(src, value_format, value_schema)
    if transform is not None:
        parsed = transform(parsed)
    return _commit_stream(parsed, table, checkpoint_dir, await_termination)


def streaming_dedup_exact(src: DataFrame, key_cols: list[str]) -> DataFrame:
    """Streaming exact dedup with keyed state (engine extension; the
    batch analog is ``operators.dedup_exact``): emit each key's FIRST
    row ever seen, suppress every later duplicate — across micro-batches
    and restarts (state lives in the checkpointed state store).

    Built on ``applyInPandasWithState``: one hash shuffle on the key,
    Arrow-batched state access, O(1) state per key (a single marker —
    the emitted row itself is not stored). At 100 TB-scale ingest the
    state store is RocksDB-backed and partitioned by the same key
    shuffle; for bounded state add a watermark upstream and switch the
    timeout to ``EventTimeTimeout`` so markers expire with the horizon.

    Contract note: within one micro-batch the "first" row among
    duplicates of a new key follows micro-batch order (same as Doris
    UNIQUE-key in-batch ties without a sequence column).
    """
    import pandas as pd  # local: keep module import light
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = src.schema
    emit_cols = [f.name for f in out_schema.fields]

    def fn(key, pdf_iter, state):
        if state.exists:
            return  # key already emitted in an earlier batch
        first = None
        for pdf in pdf_iter:
            if len(pdf) and first is None:
                first = pdf.iloc[[0]][emit_cols]
        state.update((1,))
        if first is not None:
            yield first

    return src.groupBy(*[F.col(c) for c in key_cols]).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="seen int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionized_counts(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Engine extension (NOT reference parity — Doris has no event-time
    semantics): session windows — events within ``gap`` of each other
    merge into one session per group. Native ``F.session_window`` keeps
    the state store JVM-side (no Python boundary); state per group is
    bounded by the watermark horizon. Works on both batch and streaming
    DataFrames (batch = same semantics, no state store)."""
    w = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    keys = [F.session_window(F.col(ts_col), gap).alias("session")] + [
        F.col(c) for c in (group_cols or [])
    ]
    return w.groupBy(*keys).agg(
        F.count("*").alias("n"), F.sum("value").alias("sum_value")
    )


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Engine extension (NOT reference parity — Doris has no event-time
    semantics): watermarked tumbling-window counts over a streaming
    DataFrame. Late rows beyond the watermark are dropped; state is
    bounded by watermark horizon × groups."""
    w = events.withWatermark(ts_col, watermark)
    keys = [F.window(F.col(ts_col), window).alias("win")] + [
        F.col(c) for c in (group_cols or [])
    ]
    return w.groupBy(*keys).agg(
        F.count("*").alias("n"), F.sum("value").alias("sum_value")
    )


def streaming_running_agg(
    src: DataFrame,
    key_cols: list[str],
    value_col: str = "value",
):
    """Streaming AGGREGATE-key table semantics (the continuous form of
    ``tables.py``'s aggregate model): per key, maintain running
    ``(sum, max, count)`` across micro-batches and RESTARTS, emitting
    the updated running totals for every key touched by a batch — what
    Doris's aggregate-key model shows a reader after each Routine Load
    commit.

    Built on ``applyInPandasWithState`` keyed state: one hash shuffle
    on the key, Arrow-batched, a single O(1) state tuple per key in the
    checkpointed state store (RocksDB-backed and sharded by the same
    key shuffle at scale). Spark 4's ``transformWithStateInPandas`` is
    the successor API for this exact shape (typed ValueState + TTL);
    it requires the ``protobuf`` wheel, absent in this environment —
    the GroupState form below is semantically identical here.
    """
    import pandas as pd  # local: keep module import light
    from pyspark.sql.streaming.state import GroupStateTimeout

    types = {f.name: f.dataType.simpleString() for f in src.schema.fields}
    out_schema = ", ".join(
        [f"{c} {types[c]}" for c in key_cols]
    ) + ", sum_value double, max_value double, n_rows bigint"

    def fn(key, pdf_iter, state):
        if state.exists:
            s, mx, c = state.get
        else:
            s, mx, c = 0.0, None, 0
        for pdf in pdf_iter:
            v = pdf[value_col].dropna()
            if len(v):
                s += float(v.sum())
                bmx = float(v.max())
                mx = bmx if mx is None else max(mx, bmx)
            c += int(len(pdf))
        state.update((s, mx, c))
        yield pd.DataFrame(
            {
                **{k: [key[i]] for i, k in enumerate(key_cols)},
                "sum_value": [s],
                "max_value": [mx],
                "n_rows": [c],
            }
        )

    return src.groupBy(*[F.col(c) for c in key_cols]).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="s double, mx double, c bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
