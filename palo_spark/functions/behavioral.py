"""Behavioral aggregates: RETENTION / WINDOW_FUNNEL / SEQUENCE_MATCH /
SEQUENCE_COUNT (SURVEY.md §2.4 tail; upstream
``be/src/vec/aggregate_functions/aggregate_function_{retention,
window_funnel,sequnce_match}.cpp``; ClickHouse-compatible semantics).

- ``retention`` is pure conditional aggregation → native expressions,
  one hash shuffle, whole-stage codegen.
- ``window_funnel`` / ``sequence_match`` are inherently sequential scans
  of each group's time-ordered events. Doris runs them as native
  aggregate states; without JVM code the Spark-first mapping is a
  **grouped Arrow UDF** (``applyInPandas``): one hash shuffle on the
  group key, then a vectorized per-group kernel. The per-group state is
  O(events-per-group) — the same memory contract as Doris's aggregate
  state — and groups are processed independently, so the operator
  scales horizontally with executors.
"""

from __future__ import annotations

import re
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def retention(*conds: Column) -> Column:
    """Doris ``RETENTION(cond1, cond2, ...)`` → ``array<int>``.

    Element 0 = 1 iff cond1 ever held in the group; element i = 1 iff
    cond1 held AND cond_{i+1} held (classic day-0 / day-N retention).
    Pure conditional aggregation — use inside ``groupBy().agg(...)``.
    """
    seen = [F.max(c.cast("int")) for c in conds]
    first = seen[0]
    out = [first] + [(first * s) for s in seen[1:]]
    return F.array(*[o.cast("int") for o in out])


def retention_sql(conds: Iterable[str]) -> str:
    """Oracle-SQL mirror of :func:`retention` (ANSI, DuckDB-runnable)."""
    conds = list(conds)
    first = f"MAX(CASE WHEN {conds[0]} THEN 1 ELSE 0 END)"
    elems = [first] + [
        f"({first} * MAX(CASE WHEN {c} THEN 1 ELSE 0 END))" for c in conds[1:]
    ]
    return "[" + ", ".join(f"CAST({e} AS INT)" for e in elems) + "]"


def _funnel_kernel(ts: pd.Series, flags: list[pd.Series], window_ns: int) -> int:
    """Max funnel depth: for each cond1 event, greedily chain the first
    cond2 event after it, then cond3 after that, ... all within the
    window of the cond1 event (ClickHouse windowFunnel 'default' mode).
    Timestamps are exact int64 nanoseconds — no float rounding at the
    window boundary."""
    order = ts.argsort(kind="stable")
    t = ts.iloc[order].to_numpy()
    fl = [f.iloc[order].to_numpy() for f in flags]
    best = 0
    n = len(t)
    for start in range(n):
        if not fl[0][start]:
            continue
        deadline = t[start] + window_ns
        level, pos = 1, start
        for step in range(1, len(fl)):
            nxt = None
            for j in range(pos + 1, n):
                if t[j] > deadline:
                    break
                if fl[step][j]:
                    nxt = j
                    break
            if nxt is None:
                break
            level, pos = step + 1, nxt
        best = max(best, level)
        if best == len(fl):
            break
    return best


def window_funnel(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    window_seconds: float,
    conds: list[Column],
) -> DataFrame:
    """Doris ``WINDOW_FUNNEL(window, 'default', ts, cond1, ...)`` per
    group → (group_col, funnel_level).

    Plan: project the condition flags (native), one hash shuffle on the
    group key, then an Arrow-batched per-group kernel.
    """
    flag_cols = [c.cast("boolean").alias(f"__f{i}") for i, c in enumerate(conds)]
    proj = df.select(F.col(group_col), F.col(ts_col).alias("__ts"), *flag_cols)
    n_conds = len(conds)

    window_ns = int(round(window_seconds * 1e9))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        ts_ns = pdf["__ts"].astype("datetime64[ns]").astype("int64")
        level = _funnel_kernel(
            ts_ns, [pdf[f"__f{i}"].fillna(False) for i in range(n_conds)], window_ns
        )
        return pd.DataFrame({group_col: [pdf[group_col].iloc[0]], "funnel_level": [level]})

    out_schema = f"{group_col} long, funnel_level int"
    return proj.groupBy(group_col).applyInPandas(kernel, out_schema)


_PATTERN_TOKEN = re.compile(r"\(\?(\d+)\)|\.\*|\.")


def _compile_pattern(pattern: str, n_conds: int) -> re.Pattern:
    """Translate a Doris/ClickHouse sequence pattern — ``(?N)``, ``.*``,
    ``.`` — into a Python regex over the per-event condition alphabet
    (event → letter of its first matching condition)."""
    out, pos = [], 0
    for m in _PATTERN_TOKEN.finditer(pattern):
        if m.start() != pos:
            raise ValueError(f"unsupported pattern fragment: {pattern[pos:m.start()]!r}")
        tok = m.group(0)
        if tok == ".*":
            out.append(".*")
        elif tok == ".":
            out.append(".")
        else:
            k = int(m.group(1))
            if not 1 <= k <= n_conds:
                raise ValueError(f"(?{k}) out of range for {n_conds} conditions")
            out.append(chr(ord("a") + k - 1))
        pos = m.end()
    if pos != len(pattern):
        raise ValueError(f"unsupported pattern fragment: {pattern[pos:]!r}")
    return re.compile("".join(out))


def _sequence_df(
    df: DataFrame, group_col: str, ts_col: str, conds: list[Column]
) -> tuple[DataFrame, int]:
    flag_cols = [c.cast("boolean").alias(f"__f{i}") for i, c in enumerate(conds)]
    return (
        df.select(F.col(group_col), F.col(ts_col).alias("__ts"), *flag_cols),
        len(conds),
    )


def _seq_string(pdf: pd.DataFrame, n_conds: int) -> str:
    """Per-group event string: events sorted by ts; each event matching
    ≥1 condition contributes the letter of its first matching condition;
    non-matching events are skipped (ClickHouse semantics)."""
    order = pdf["__ts"].argsort(kind="stable")
    chars = []
    flags = [pdf[f"__f{i}"].fillna(False).to_numpy() for i in range(n_conds)]
    for j in order:
        for i in range(n_conds):
            if flags[i][j]:
                chars.append(chr(ord("a") + i))
                break
    return "".join(chars)


def sequence_match(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    pattern: str,
    conds: list[Column],
) -> DataFrame:
    """Doris ``SEQUENCE_MATCH('(?1).*(?2)', ts, cond...)`` per group →
    (group_col, matched: boolean)."""
    proj, n = _sequence_df(df, group_col, ts_col, conds)
    rx = _compile_pattern(pattern, n)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        s = _seq_string(pdf, n)
        return pd.DataFrame(
            {group_col: [pdf[group_col].iloc[0]], "matched": [rx.search(s) is not None]}
        )

    return proj.groupBy(group_col).applyInPandas(kernel, f"{group_col} long, matched boolean")


def sequence_count(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    pattern: str,
    conds: list[Column],
) -> DataFrame:
    """Doris ``SEQUENCE_COUNT`` — non-overlapping pattern matches per
    group → (group_col, n_matches)."""
    proj, n = _sequence_df(df, group_col, ts_col, conds)
    rx = _compile_pattern(pattern, n)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        s = _seq_string(pdf, n)
        return pd.DataFrame(
            {group_col: [pdf[group_col].iloc[0]], "n_matches": [len(rx.findall(s))]}
        )

    return proj.groupBy(group_col).applyInPandas(kernel, f"{group_col} long, n_matches int")
