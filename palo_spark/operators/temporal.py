"""Temporal joins: distributed as-of join (point-in-time correctness).

Doris (like most OLAP engines) expresses "latest reading at or before t"
as a correlated subquery or window trick; pandas has ``merge_asof``;
DuckDB has native ``ASOF JOIN``. Spark has neither, and the naive
formulations are scale-killers:

- range join (``l.ts >= r.ts``) → O(|l|·|r|) per key under
  BroadcastNestedLoop, or a bounded-but-huge range-bucket explosion;
- "max(ts) per left row" correlated aggregate → one shuffle PER QUERY
  SHAPE plus a re-join.

The scalable shape — what Flink's temporal join and pandas
``merge_asof`` both do, distributed here — is a single co-partitioned
merge: union both sides tagged, ONE shuffle on the join key, one
in-partition sort on (ts, side), then a running ``last(value,
ignorenulls=True)`` window carries the most recent right-side value
onto each left row. Cost is identical to one hash-agg over the same
key: no candidate pairs ever materialize.

Skew: a hot key serializes its window partition. Keys here are entity
ids (user, device, symbol) whose per-key row counts are bounded by
real-world activity; for a pathological key, pre-bucket by coarse time
range (carrying the last right row of the previous bucket forward) —
documented, not automated.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HELPER = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance: Column | None = None,
) -> DataFrame:
    """As-of left join: each left row picks the single right row with the
    greatest ``right_ts <= left_ts`` (``direction="backward"``, inclusive
    — pandas ``merge_asof`` / DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``
    semantics) or the smallest ``right_ts >= left_ts`` (``"forward"``)
    within the same ``on`` key group. Unmatched left rows keep NULLs.

    ``tolerance``: optional max gap in SECONDS (numeric literal or
    Column); a match farther than that from the left timestamp is
    nulled out (the row stays, like pandas ``merge_asof(tolerance=)``).

    Right-side value columns that collide with left column names must be
    renamed by the caller first (fail-loud below). Ties on
    ``(key, right_ts)`` should be pre-deduplicated (e.g. keep
    ``max(id)``) — both here and in any reference engine the winner
    among exact-timestamp duplicates is otherwise unspecified.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: direction must be backward/forward, got {direction}")
    carried = [c for c in right.columns if c not in keys and c != right_ts]
    clash = [c for c in carried + ["matched_" + right_ts] if c in left.columns]
    if clash:
        raise ValueError(
            f"asof_join: right value columns {clash} collide with left "
            "columns — rename them before joining"
        )

    # Common unioned schema: left cols + matched right ts + carried cols.
    rt = "__asof_rts"
    l2 = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(None).cast(right.schema[right_ts].dataType).alias(rt),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in carried],
        F.lit(1).alias(_HELPER),
    )
    null_left = [c for c in left.columns if c not in keys]
    r2 = right.select(
        *[F.col(k) for k in keys],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in null_left
        ],
        F.col(right_ts).alias(rt),
        *[F.col(c) for c in carried],
        F.lit(0).alias(_HELPER),
    ).select(l2.columns)  # align column order
    # Order time axis: right rows sort before left rows at equal ts so the
    # inclusive (<= / >=) match sees them. Forward = reversed time order.
    t_axis = F.coalesce(F.col(rt), F.col(left_ts))
    if direction == "backward":
        order = [t_axis.asc(), F.col(_HELPER).asc()]
    else:
        order = [t_axis.desc(), F.col(_HELPER).asc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry = [rt] + carried
    # Carry ONE struct per right row, not per-column last(): a per-column
    # ignorenulls carry would skip a matched row's legitimately-NULL value
    # and resurrect an OLDER right row's value, mixing columns across two
    # different right rows. The struct is non-null for every right row, so
    # NULL field values propagate together with their own row (pandas
    # merge_asof semantics).
    m = "__asof_match"
    out = l2.unionByName(r2)
    out = out.withColumn(
        m,
        F.when(
            F.col(_HELPER) == 0,
            F.struct(*[F.col(c).alias(c) for c in carry]),
        ),
    )
    out = out.withColumn(m, F.last(m, ignorenulls=True).over(w))
    out = out.filter(F.col(_HELPER) == 1)
    for c in carry:
        out = out.withColumn(c, F.col(m).getField(c))
    out = out.drop(m)
    if tolerance is not None:
        # timestampdiff accepts TIMESTAMP_NTZ (unix_micros does not).
        gap = F.abs(
            F.expr(f"timestampdiff(MICROSECOND, {rt}, {left_ts})")
        ) / F.lit(1_000_000.0)
        ok = F.col(rt).isNotNull() & (gap <= tolerance)
        for c in carry:
            out = out.withColumn(c, F.when(ok, F.col(c)))
    return out.drop(_HELPER).withColumnRenamed(rt, "matched_" + right_ts)
