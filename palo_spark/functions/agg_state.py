"""AGG_STATE combinators (Doris 2.1) — ``<agg>_state`` / ``<agg>_union``
/ ``<agg>_merge``.

SURVEY §2 row "AGG_STATE (2.1): generic partial-agg state — out of
scope v1"; closed here as a bonus. Doris stores serialized aggregate
states in AGGREGATE-KEY tables and finishes them later
[upstream: be/src/vec/aggregate_functions/aggregate_function_state_union.h].

Spark-first re-expression: a state is a plain **struct column** whose
fields are the algebraic pieces of the aggregate (sum; sum+count;
n+s1+s2; ...), so

- ``X_state(col)``   — aggregate expression producing the group's state,
- ``X_union(state)`` — aggregate expression combining states into one,
- ``X_merge(state)`` — aggregate expression finishing states to a value,

all stay native Catalyst aggregates with map-side partial aggregation
(two-phase HashAggregate) — the exact property Doris's agg_state exists
to provide. No serialization format is needed because Spark structs ARE
the wire format (columnar, shuffle-safe, parquet-persistable: write the
state column to a table, read it back, ``_union``/``_merge`` later —
the Doris rollup-refresh pattern).

Float determinism: double inputs are accumulated as exact
``DECIMAL(38, 6)`` grid sums (the suite's dsum discipline), so states
combine order-independently — required for a state that may be merged
in any partition order, and what makes the suite oracle bit-exact.

Sketch states (HLL / bitmap / quantile) already exist as first-class
state columns in ``palo_spark.functions.sketches`` (``hll_state`` /
``to_bitmap``+union / ``quantile_state``) — this module covers the
scalar-algebraic family; ``hll_union`` there IS ``hll_union`` in Doris
agg_state terms.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCALE = 6
_M = float(10**_SCALE)


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


def _grid(col) -> Column:
    """Exact decimal accumulation cell: floor(x*1e6) as DECIMAL(38,0)."""
    return F.floor(_c(col).cast("double") * F.lit(_M)).cast("decimal(38,0)")


# ------------------------------------------------------------------ sum


def sum_state(col) -> Column:
    """Doris ``sum_state(v)`` — struct{s} partial sum of the group."""
    return F.struct(F.sum(_grid(col)).alias("s"))


def sum_union(state) -> Column:
    """Doris ``sum_union(st)`` — combine sum states."""
    s = _c(state)
    return F.struct(F.sum(s["s"]).alias("s"))


def sum_merge(state) -> Column:
    """Doris ``sum_merge(st)`` — finish to the summed value (double)."""
    s = _c(state)
    return F.sum(s["s"]).cast("double") / F.lit(_M)


# ---------------------------------------------------------------- count


def count_state(col=None) -> Column:
    c = F.count(F.lit(1)) if col is None else F.count(_c(col))
    return F.struct(c.alias("n"))


def count_union(state) -> Column:
    return F.struct(F.sum(_c(state)["n"]).alias("n"))


def count_merge(state) -> Column:
    return F.sum(_c(state)["n"]).cast("bigint")


# ------------------------------------------------------------------ avg


def avg_state(col) -> Column:
    """struct{s, n} — decimal grid sum + count."""
    return F.struct(
        F.sum(_grid(col)).alias("s"), F.count(_c(col)).alias("n")
    )


def avg_union(state) -> Column:
    s = _c(state)
    return F.struct(F.sum(s["s"]).alias("s"), F.sum(s["n"]).alias("n"))


def avg_merge(state) -> Column:
    s = _c(state)
    return (F.sum(s["s"]).cast("double") / F.lit(_M)) / F.sum(s["n"])


# -------------------------------------------------------------- min/max


def min_state(col) -> Column:
    return F.struct(F.min(_c(col)).alias("m"))


def min_union(state) -> Column:
    return F.struct(F.min(_c(state)["m"]).alias("m"))


def min_merge(state) -> Column:
    return F.min(_c(state)["m"])


def max_state(col) -> Column:
    return F.struct(F.max(_c(col)).alias("m"))


def max_union(state) -> Column:
    return F.struct(F.max(_c(state)["m"]).alias("m"))


def max_merge(state) -> Column:
    return F.max(_c(state)["m"])


# --------------------------------------------------------------- stddev
# Population variance from (n, Σx, Σx²) on the decimal grid: states
# combine by field-wise sum, finish as (s2/n - (s1/n)²). Quantizing x
# to the 1e-6 grid first makes Σx² exact and order-independent too.


def stddev_state(col) -> Column:
    g = _grid(col)
    return F.struct(
        F.count(_c(col)).alias("n"),
        F.sum(g).alias("s1"),
        F.sum(g * g).alias("s2"),
    )


def stddev_union(state) -> Column:
    s = _c(state)
    return F.struct(
        F.sum(s["n"]).alias("n"),
        F.sum(s["s1"]).alias("s1"),
        F.sum(s["s2"]).alias("s2"),
    )


def stddev_merge(state, sample: bool = False) -> Column:
    """Finish to stddev_pop (or stddev_samp with ``sample=True``)."""
    s = _c(state)
    n = F.sum(s["n"]).cast("double")
    s1 = F.sum(s["s1"]).cast("double") / F.lit(_M)
    s2 = F.sum(s["s2"]).cast("double") / F.lit(_M * _M)
    var = (s2 - s1 * s1 / n) / (n - F.lit(1.0) if sample else n)
    return F.sqrt(F.greatest(var, F.lit(0.0)))


_FAMILIES = {
    "sum": (sum_state, sum_union, sum_merge),
    "count": (count_state, count_union, count_merge),
    "avg": (avg_state, avg_union, avg_merge),
    "min": (min_state, min_union, min_merge),
    "max": (max_state, max_union, max_merge),
    "stddev": (stddev_state, stddev_union, stddev_merge),
}


def state(func: str, col=None) -> Column:
    """Generic Doris spelling: ``state('avg', c)`` ≡ ``avg_state(c)``."""
    fn = _FAMILIES[func.lower()][0]
    return fn() if col is None and func.lower() == "count" else fn(col)


def union(func: str, state_col) -> Column:
    return _FAMILIES[func.lower()][1](state_col)


def merge(func: str, state_col) -> Column:
    return _FAMILIES[func.lower()][2](state_col)
