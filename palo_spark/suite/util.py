"""Shared helpers for the query suite.

Float-aggregation determinism
-----------------------------
``SUM(double)`` is order-dependent in IEEE arithmetic, and both Spark and
DuckDB aggregate in parallel with nondeterministic partition order — plain
double sums would hash-mismatch in the last bits. All suite aggregates over
doubles therefore accumulate in *exact decimal* (order-independent) and
cast to double once at the end. The same formulation is used verbatim in
the oracle SQL, so results match bit-for-bit. This mirrors what Doris does
for DECIMAL columns; for 100 TB scale the decimal hash-agg is still
JVM-side whole-stage-codegen (no Python boundary).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return col if isinstance(col, Column) else F.col(col)


def dsum(col, scale: int = 6) -> Column:
    """Order-independent SUM over a double column/expression.

    ``floor(x * 10^scale)`` is pure IEEE double arithmetic — bit-identical
    in any engine — and yields an exactly-representable integer, which is
    then summed exactly as DECIMAL(38,0) (no overflow at any realistic
    scale) and divided once at the end. This avoids engine-specific
    double→decimal rounding (Spark converts via shortest-string repr,
    DuckDB via exact binary value — they disagree near grid boundaries).
    """
    m = float(10**scale)
    return (
        F.sum(F.floor(_c(col) * F.lit(m)).cast("decimal(38,0)")).cast("double") / F.lit(m)
    )


def davg(col, scale: int = 6) -> Column:
    """Order-independent AVG over a double column/expression (see dsum)."""
    c = _c(col)
    m = float(10**scale)
    return (
        F.sum(F.floor(c * F.lit(m)).cast("decimal(38,0)")).cast("double") / F.lit(m)
    ) / F.count(c)


def o_dsum(expr: str, scale: int = 6) -> str:
    """Oracle-SQL mirror of :func:`dsum`."""
    m = float(10**scale)
    return (
        f"(CAST(SUM(CAST(FLOOR(({expr}) * {m!r}) AS DECIMAL(38,0))) AS DOUBLE) / {m!r})"
    )


def o_davg(expr: str, scale: int = 6) -> str:
    """Oracle-SQL mirror of :func:`davg`."""
    m = float(10**scale)
    return (
        f"((CAST(SUM(CAST(FLOOR(({expr}) * {m!r}) AS DECIMAL(38,0))) AS DOUBLE) / {m!r})"
        f" / COUNT({expr}))"
    )


def register(queries: dict, oracle: dict):
    """Per-module registration decorator factory.

    >>> QUERIES, ORACLE = {}, {}
    >>> q = register(QUERIES, ORACLE)
    >>> @q("name", "SELECT 1 AS x")          # oracle_sql positional
    ... def _name(spark, sf_dir): ...
    """

    def q(name: str, oracle_sql: str | None = None):
        def deco(fn):
            queries[name] = fn
            if oracle_sql is not None:
                oracle[name] = oracle_sql
            return fn

        return deco

    return q
