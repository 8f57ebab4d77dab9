"""Distributed global ranking: exact row_number / NTILE without a
single-partition window.

``NTILE(k) OVER (ORDER BY ...)`` with no PARTITION BY is the classic
scale-killer: Spark plans it as ``Exchange SinglePartition`` → one task
sorts the ENTIRE frame. Fine at 10⁵ rows, fatal at 10⁹. Doris avoids it
the same way every MPP engine does — range-partition the sort key, rank
within ranges, add cross-range offsets [upstream:
be/src/vec/exec/vpartition_sort_node.* ships the same idea for
PARTITION_SORT].

The distributed shape here (the standard zipWithIndex design, kept
entirely inside the DataFrame plan — no driver collect of data, only
a scalar count to materialize):

1. ``repartitionByRange(P, keys)`` — ONE range shuffle; partition p
   holds a contiguous key range, so global order = (partition order,
   in-partition order). The ranged frame is eagerly local-checkpointed
   so every downstream branch reads the SAME physical partitioning and
   the blocks free with the result frame (see ``_ranged_with_offsets``).
2. per-partition counts (tiny: P rows) → per-partition global offset
   via a broadcast theta-join of the count frame with itself
   (P² ≤ 32² pairs — metadata-scale, no window, no collect).
3. ``row_number() OVER (PARTITION BY pid ORDER BY keys)`` + offset —
   a KEYED window, max partition size n/P.

Exact NTILE semantics from the global row number rn ∈ [1, n]: with
q = n div k, r = n mod k, tiles 1..r hold q+1 rows and tiles r+1..k
hold q rows — identical to the SQL-standard NTILE, so results are
bit-equal to the oracle's ``NTILE(k) OVER (ORDER BY ...)`` whenever the
order key is unique.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID, _CNT, _OFF, _RN, _N = "__gr_pid", "__gr_cnt", "__gr_off", "__gr_rn", "__gr_n"


def _ranged_with_offsets(
    df: DataFrame, order_cols: list[str], num_partitions: int
) -> DataFrame:
    """Range-shuffle ``df`` on the order keys and attach each row's
    partition-start global offset plus the total row count.

    The ranged frame is materialized (eager localCheckpoint) BEFORE the
    plan branches. This is load-bearing for correctness, not a cache
    hint: without it, Catalyst column-prunes the counts branch down to
    the range keys, so its range Exchange is a *different plan instance*
    from the main branch's — each samples RangePartitioner boundaries
    independently, and the ``__gr_pid`` ↔ count mapping can disagree
    with the partition assignment the main branch actually used
    (observed: duplicate global row numbers whenever the frame carries
    any payload column outside ``order_cols``; pinned by
    tests/test_plans.py::test_global_ranking_with_payload_column).
    Pinning one physical frame makes the pid assignment a fact of the
    data rather than of the plan.

    localCheckpoint over persist+count (ADVICE r7: persisted frames
    were never unpersisted, accumulating in the CacheManager for the
    session lifetime): the eager checkpoint materializes identically
    (MEMORY_AND_DISK, spills, one pass) but TRUNCATES lineage, so the
    pid column can never be recomputed under different boundaries, and
    the blocks are reference-counted — Spark's ContextCleaner frees
    them when the caller drops the result DataFrame, instead of
    requiring an explicit unpersist nobody can safely time."""
    keys = [F.col(c) for c in order_cols]
    ranged = df.repartitionByRange(num_partitions, *keys).withColumn(
        _PID, F.spark_partition_id()
    )
    # eager: bakes pid into the checkpointed rows before the plan forks
    ranged = ranged.localCheckpoint(eager=True)
    counts = ranged.groupBy(_PID).agg(F.count("*").alias(_CNT))
    a, b = counts.alias("a"), counts.alias("b")
    offsets = (
        a.join(F.broadcast(b), F.col(f"b.{_PID}") < F.col(f"a.{_PID}"), "left")
        .groupBy(F.col(f"a.{_PID}").alias(_PID))
        .agg(F.coalesce(F.sum(F.col(f"b.{_CNT}")), F.lit(0)).alias(_OFF))
    )
    total = counts.agg(F.sum(_CNT).alias(_N))
    return ranged.join(F.broadcast(offsets), _PID).join(F.broadcast(total))


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    *,
    out: str = "rn",
    num_partitions: int = 32,
) -> DataFrame:
    """Exact global ``ROW_NUMBER() OVER (ORDER BY order_cols)`` as a
    range shuffle + keyed window — no single-partition stage anywhere
    in the plan. Order keys should be unique for determinism (same
    contract as the window form)."""
    keys = [F.col(c) for c in order_cols]
    w = Window.partitionBy(_PID).orderBy(*keys)
    return (
        _ranged_with_offsets(df, order_cols, num_partitions)
        .withColumn(out, (F.row_number().over(w) + F.col(_OFF)).cast("bigint"))
        .drop(_PID, _OFF, _N)
    )


def global_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    *,
    out: str = "cum",
    num_partitions: int = 32,
) -> DataFrame:
    """Exact global ``SUM(value) OVER (ORDER BY order_cols ROWS
    UNBOUNDED PRECEDING)`` without a single-partition window — the same
    range-shuffle + broadcast-offsets shape as ``global_row_number``,
    with per-partition SUMs instead of COUNTs. Order keys must be
    unique (ties would make the running sum order-dependent, same
    contract as the window form over a unique key)."""
    keys = [F.col(c) for c in order_cols]
    ranged = df.repartitionByRange(num_partitions, *keys).withColumn(
        _PID, F.spark_partition_id()
    )
    # eager localCheckpoint: see _ranged_with_offsets (pins pid, no
    # CacheManager residue — blocks GC-clean with the result frame)
    ranged = ranged.localCheckpoint(eager=True)
    sums = ranged.groupBy(_PID).agg(F.sum(value_col).alias(_CNT))
    a, b = sums.alias("a"), sums.alias("b")
    offsets = (
        a.join(F.broadcast(b), F.col(f"b.{_PID}") < F.col(f"a.{_PID}"), "left")
        .groupBy(F.col(f"a.{_PID}").alias(_PID))
        .agg(F.coalesce(F.sum(F.col(f"b.{_CNT}")), F.lit(0)).alias(_OFF))
    )
    w = (
        Window.partitionBy(_PID)
        .orderBy(*keys)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranged.join(F.broadcast(offsets), _PID)
        .withColumn(out, F.sum(value_col).over(w) + F.col(_OFF))
        .drop(_PID, _OFF)
    )


def global_ntile(
    df: DataFrame,
    order_cols: list[str],
    k: int,
    *,
    out: str = "tile",
    num_partitions: int = 32,
) -> DataFrame:
    """Exact SQL ``NTILE(k) OVER (ORDER BY order_cols)`` without the
    global window: global row number (see module docstring), then the
    standard tile split — first ``n mod k`` tiles get ``n div k + 1``
    rows, the rest ``n div k``."""
    keys = [F.col(c) for c in order_cols]
    w = Window.partitionBy(_PID).orderBy(*keys)
    rn: Column = F.row_number().over(w) + F.col(_OFF)
    q = F.floor(F.col(_N) / k)
    r = F.col(_N) % k
    big = r * (q + 1)  # rows covered by the (q+1)-sized tiles
    tile = F.when(rn <= big, F.ceil(rn / (q + 1))).otherwise(
        r + F.ceil((rn - big) / F.greatest(q, F.lit(1)))
    )
    return (
        _ranged_with_offsets(df, order_cols, num_partitions)
        .withColumn(out, tile.cast("int"))
        .drop(_PID, _OFF, _N)
    )
