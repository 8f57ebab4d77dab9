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
