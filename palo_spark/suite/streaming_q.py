"""Continuous-ingestion coverage (SURVEY.md §2.7; Routine Load).

The query replays the ``events`` parquet through a Structured Streaming
file source into a managed Table via ``foreachBatch`` +
label-deduplicated inserts (the exactly-once construction), then
aggregates the landed table — which must equal aggregating the source
directly (the oracle). This is a full end-to-end ingestion correctness
check, not a smoke test.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from palo_spark.catalog import load_table
from palo_spark.streaming import routine_load
from palo_spark.suite.util import dsum, o_dsum, register
from palo_spark.tables import Table

QUERIES: dict = {}
ORACLE: dict = {}
q = register(QUERIES, ORACLE)

_ROOT = f"/tmp/palo_spark_streaming_{os.getpid()}"


@q(
    "streaming_routine_load",
    f"""
    SELECT event_type, COUNT(*) AS n, {o_dsum('value')} AS sum_value
    FROM events GROUP BY event_type
    """,
)
def streaming_routine_load(spark, sf_dir):
    """Routine-Load equivalent: stream events (availableNow) →
    foreachBatch → labeled Table.insert (exactly-once), then aggregate
    the landed table. Must match aggregating the source directly."""
    base = os.path.join(_ROOT, "routine")
    shutil.rmtree(base, ignore_errors=True)
    tdir = os.path.join(base, "table")
    ckpt = os.path.join(base, "ckpt")
    src_dir = os.path.join(base, "incoming")
    os.makedirs(tdir, exist_ok=True)
    os.makedirs(src_dir, exist_ok=True)

    # stage the fixture into the "incoming" directory the stream watches
    # (file-source streams consume directories, like a landing zone)
    src_file = f"{sf_dir.rstrip('/')}/events.parquet"
    shutil.copy(src_file, os.path.join(src_dir, "events.parquet"))
    schema = spark.read.parquet(src_file).schema  # raw schema (ts as long)
    t = Table(spark, "events_stream", "DUPLICATE", ["event_id"], location=tdir)
    routine_load(spark, src_dir, schema, t, ckpt, fmt="parquet")
    return t.read().groupBy("event_type").agg(
        F.count("*").alias("n"), dsum("value").alias("sum_value")
    )


@q(
    "streaming_upsert_unique",
    """
    WITH v1 AS (
        SELECT event_id, user_id, event_type, value, 1 AS v FROM events
    ), v2 AS (
        SELECT event_id, user_id, 'replayed' AS event_type, value + 1000.0, 2
        FROM events WHERE event_id % 7 = 0
    ), u AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2),
    r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY v DESC) AS rn
        FROM u
    )
    SELECT event_id, user_id, event_type, value FROM r WHERE rn = 1
    """,
)
def streaming_upsert_unique(spark, sf_dir):
    """Real-time upsert via continuous ingestion (Doris UNIQUE-key +
    Routine Load): two staged file drops stream into a UNIQUE table
    through the same checkpoint — the second drop re-keys 1/7 of the
    events — and the merge-on-read view must show latest-version rows.
    This is the reference's 'streaming upsert' end-to-end: exactly-once
    commits × key merge."""
    base = os.path.join(_ROOT, "upsert")
    shutil.rmtree(base, ignore_errors=True)
    tdir = os.path.join(base, "table")
    ckpt = os.path.join(base, "ckpt")
    src_dir = os.path.join(base, "incoming")
    os.makedirs(src_dir, exist_ok=True)

    cols = ["event_id", "user_id", "event_type", "value"]
    ev = load_table(spark, sf_dir, "events").select(*cols)
    ev.write.mode("overwrite").parquet(os.path.join(src_dir))
    schema = ", ".join(["event_id long", "user_id long", "event_type string", "value double"])
    t = Table(spark, "events_upsert", "UNIQUE", ["event_id"], location=tdir)
    routine_load(spark, src_dir, schema, t, ckpt, fmt="parquet")
    # second drop: modified subset lands later in the same stream
    (
        ev.filter(F.col("event_id") % 7 == 0)
        .withColumn("event_type", F.lit("replayed"))
        .withColumn("value", F.col("value") + 1000.0)
        .write.mode("append")
        .parquet(os.path.join(src_dir))
    )
    routine_load(spark, src_dir, schema, t, ckpt, fmt="parquet")
    return t.read()


@q(
    "streaming_tumbling_window",
    f"""
    SELECT CAST(user_id % 5 AS BIGINT) AS cohort,
           CAST(epoch_us(CAST(time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP))
                              AS TIMESTAMP)) AS BIGINT) AS win_start_us,
           CAST(COUNT(*) AS BIGINT) AS n,
           {o_dsum('value')} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def streaming_tumbling_window(spark, sf_dir):
    """Watermarked tumbling-window aggregation (`streaming.windowed_counts`
    semantics, run in batch mode — identical plan shape minus the state
    store): native ``F.window`` 1-hour buckets per cohort. Oracle
    replays the bucketing with DuckDB ``time_bucket``. The streaming
    form of this exact aggregation (watermark + append mode) is pinned
    by tests/test_sources_streaming.py::test_windowed_counts_engine_extension."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.withColumn("cohort", F.col("user_id") % 5)
        .groupBy(F.window("ts", "1 hour").alias("win"), "cohort")
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        .select(
            "cohort",
            F.unix_micros(F.col("win.start").cast("timestamp")).alias(
                "win_start_us"
            ),
            "n",
            "sum_value",
        )
    )


@q(
    "streaming_state_dedup",
    """
    SELECT event_id, user_id, event_type, value
    FROM events WHERE event_id % 3 = 0
    """,
)
def streaming_state_dedup(spark, sf_dir):
    """Keyed-state streaming dedup end-to-end
    (``streaming.streaming_dedup_exact``: applyInPandasWithState, one
    hash shuffle on the key, O(1) marker state per key): the fixture
    subset is dropped THREE times — twice in run 1 (maxFilesPerTrigger=1
    forces two micro-batches, so in-run cross-batch suppression is
    exercised) and once more in run 2 through the same checkpoint (state
    survives restart). Landed output must equal the distinct source rows
    — every later copy suppressed by state, none by luck of batching."""
    base = os.path.join(_ROOT, "statededup")
    shutil.rmtree(base, ignore_errors=True)
    src_dir = os.path.join(base, "incoming")
    out_dir = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src_dir, exist_ok=True)
    os.makedirs(out_dir, exist_ok=True)

    from palo_spark.streaming import streaming_dedup_exact

    cols = ["event_id", "user_id", "event_type", "value"]
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 3 == 0)
        .select(*cols)
    )
    schema = "event_id long, user_id long, event_type string, value double"

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
        )
        (
            streaming_dedup_exact(stream, ["event_id"])
            .writeStream.trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .foreachBatch(
                lambda bdf, _id: bdf.write.mode("append").parquet(out_dir)
            )
            .start()
            .awaitTermination()
        )

    # The state-store partition count is FIXED at the stream's first run
    # (it shards the checkpointed state); at fixture scale 32 shards ×
    # 3 micro-batches × Python workers is pure overhead (measured 78s →
    # ~15s at 4). At 100 TB you'd set it HIGH for the same reason you
    # size any shuffle — this is per-stream sizing, not a semantics knob.
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        ev.coalesce(1).write.mode("append").parquet(src_dir)  # drop 1
        ev.coalesce(1).write.mode("append").parquet(src_dir)  # drop 2 (dupes)
        run()
        ev.coalesce(1).write.mode("append").parquet(src_dir)  # drop 3 (restart)
        run()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return spark.read.parquet(out_dir)


@q(
    "streaming_session_window",
    f"""
    WITH g AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                        > INTERVAL 4 HOUR
                  THEN 1 ELSE 0 END AS brk
      FROM events
    ), i AS (
      SELECT user_id, ts, value,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM g
    )
    SELECT user_id,
           CAST(epoch_us(MIN(ts)) AS BIGINT) AS session_start_us,
           CAST(COUNT(*) AS BIGINT) AS n,
           {o_dsum('value')} AS sum_value
    FROM i GROUP BY user_id, island
    """,
)
def streaming_session_window(spark, sf_dir):
    """Native ``F.session_window`` sessionization (the streaming
    session-state operator, run in batch mode — identical semantics,
    no state store): events within a 4h gap merge per user. Boundary
    semantics pinned empirically: an event at exactly prev+gap MERGES
    (Spark's session end is inclusive for merging), matching the
    oracle's ``> gap`` break. The oracle replays sessions as
    gaps-and-islands (LAG + running SUM of breaks) — a genuine value
    oracle over session starts, sizes, and sums. The watermarked
    streaming form of the same aggregation is pinned by
    tests/test_sources_streaming.py::test_sessionized_counts_gap_semantics."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.session_window(F.col("ts"), "4 hours").alias("session"),
            "user_id",
        )
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        .select(
            "user_id",
            F.unix_micros(F.col("session.start").cast("timestamp")).alias(
                "session_start_us"
            ),
            "n",
            "sum_value",
        )
    )


@q(
    "streaming_running_agg_model",
    """
    SELECT event_type,
           CAST(SUM(cents) AS DOUBLE) AS sum_value,
           CAST(MAX(cents) AS DOUBLE) AS max_value,
           COUNT(*) AS n_rows
    FROM (
        SELECT event_type, CAST(FLOOR(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_id % 4 = 0
    )
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def streaming_running_agg_model(spark, sf_dir):
    """Continuous AGGREGATE-key model via ``transformWithStateInPandas``
    (``streaming.streaming_running_agg``): per-key running (sum, max,
    count) ValueState maintained across micro-batches AND a restart —
    the stream is fed in two halves through the same checkpoint. Every
    batch emits the key's running totals; the LAST emission per key
    (unique: the running count strictly increases) must equal the plain
    batch aggregate of everything fed — which is exactly what the
    DuckDB oracle computes. Values are floor-quantized to integer cents
    upstream so state addition is order-exact (doubles stay exact
    through 2^53)."""
    base = os.path.join(_ROOT, "runagg")
    shutil.rmtree(base, ignore_errors=True)
    src_dir = os.path.join(base, "incoming")
    out_dir = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    os.makedirs(src_dir, exist_ok=True)
    os.makedirs(out_dir, exist_ok=True)

    from palo_spark.streaming import streaming_running_agg

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 4 == 0)
        .select(
            "event_id",
            "event_type",
            F.floor(F.col("value") * 100).cast("double").alias("value"),
        )
    )
    schema = "event_id long, event_type string, value double"

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src_dir)
        )
        (
            streaming_running_agg(stream, ["event_type"], "value")
            .writeStream.trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .foreachBatch(
                lambda bdf, _id: bdf.write.mode("append").parquet(out_dir)
            )
            .start()
            .awaitTermination()
        )

    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        ev.filter(F.col("event_id") % 8 == 0).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
        run()  # first half
        ev.filter(F.col("event_id") % 8 != 0).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
        run()  # second half through the same checkpoint (restart)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)

    snaps = spark.read.parquet(out_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy(F.desc("n_rows"))
    return (
        snaps.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("event_type", "sum_value", "max_value", "n_rows")
        .orderBy("event_type")
    )


@q(
    "streaming_static_enrich",
    f"""
    SELECT COALESCE(c.c_mktsegment, 'unknown') AS segment,
           CAST(COUNT(*) AS BIGINT) AS n,
           {o_dsum('e.value')} AS sum_value
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
    """,
)
def streaming_static_enrich(spark, sf_dir):
    """Stream-static enrichment join — the canonical streaming-ETL
    shape: a file-source STREAM of events broadcast-joined to the
    static ``customer`` dimension (no shuffle, no state store for the
    join; the dimension is re-resolved per micro-batch, which is how
    slowly-changing dims pick up updates), then a complete-mode global
    aggregate per market segment. Runs as a REAL StreamingQuery
    (availableNow trigger, memory sink); the oracle is the identical
    batch join+agg over the same rows."""
    import uuid

    name = "enrich_" + uuid.uuid4().hex[:8]
    src_dir = os.path.join(_ROOT, name)
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    ev.write.mode("overwrite").parquet(src_dir)
    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    s = spark.readStream.schema(
        "event_id bigint, user_id bigint, value double"
    ).parquet(src_dir)
    joined = s.join(
        F.broadcast(dim), s["user_id"] == dim["c_custkey"], "left"
    )
    agg = joined.groupBy(
        F.coalesce(F.col("c_mktsegment"), F.lit("unknown")).alias("segment")
    ).agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
    assert agg.isStreaming
    sq = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", os.path.join(_ROOT, name + "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination()
    return spark.table(name)


@q(
    "streaming_stream_stream_join",
    """
    SELECT p.event_id AS purchase_id, c.event_id AS click_id
    FROM events p
    JOIN events c
      ON p.event_type = 'purchase' AND c.event_type = 'click'
     AND p.user_id = c.user_id
     AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
    ORDER BY purchase_id, click_id
    """,
)
def streaming_stream_stream_join(spark, sf_dir):
    """Stream-stream inner join — the hardest Structured Streaming
    operator: purchases and clicks arrive as two independent streams;
    each purchase joins every click by the same user within the
    preceding hour. Both sides carry watermarks and the join carries the
    time-range constraint, so state for rows older than
    watermark − 1 h is evictable (the canonical interval-join state
    bound); the 30-day watermark here covers the fixture's full span, so
    the streamed result is COMPLETE and must equal the batch range join
    (the oracle) row for row."""
    import uuid

    name = "ssj_" + uuid.uuid4().hex[:8]
    src_dir = os.path.join(_ROOT, name)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
    )
    ev.write.mode("overwrite").parquet(src_dir)
    schema = "event_id bigint, user_id bigint, ts timestamp, event_type string"
    s1 = spark.readStream.schema(schema).parquet(src_dir)
    s2 = spark.readStream.schema(schema).parquet(src_dir)
    p = (
        s1.filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "30 days")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
    )
    c = (
        s2.filter(F.col("event_type") == "click")
        .withWatermark("ts", "30 days")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
    )
    joined = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "inner",
    ).select("purchase_id", "click_id")
    assert joined.isStreaming
    sq = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", os.path.join(_ROOT, name + "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination()
    return spark.table(name).orderBy("purchase_id", "click_id")
