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

import numpy as np
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
    """Sorting wrapper over :func:`_funnel_core` for unsorted input."""
    order = ts.argsort(kind="stable")
    t = ts.iloc[order].to_numpy()
    fl = [f.iloc[order].to_numpy().astype(bool) for f in flags]
    return _funnel_core(t, fl, window_ns)


def _funnel_core(t: np.ndarray, fl: list[np.ndarray], window_ns: int) -> int:
    """Max funnel depth over time-sorted events: for each cond1 event,
    greedily chain the first cond2 event after it, then cond3 after
    that, ... all within the window of the cond1 event (ClickHouse
    windowFunnel 'default' mode). Timestamps are exact int64
    nanoseconds — no float rounding at the window boundary.

    Vectorized: all cond1 starts advance together; step k is one
    ``searchsorted`` of every live chain's position into cond-k's sorted
    event indices — O(levels · n log n) numpy, no per-event Python.
    "First flag-k event after pos" is exactly the greedy choice, and if
    that first one is past the deadline every later one is too, so the
    chain dies — identical to the scalar scan it replaces."""
    starts = np.flatnonzero(fl[0])
    if starts.size == 0:
        return 0
    deadline = t[starts] + window_ns
    pos = starts
    best = 1
    for step in range(1, len(fl)):
        idxs = np.flatnonzero(fl[step])
        if idxs.size == 0:
            break
        j = np.searchsorted(idxs, pos + 1, side="left")
        has = j < idxs.size
        nxt = idxs[np.minimum(j, idxs.size - 1)]  # garbage where ~has; masked next
        alive = has & (t[nxt] <= deadline)
        if not alive.any():
            break
        pos, deadline = nxt[alive], deadline[alive]
        best = step + 1
    return best


def _group_bounds(g: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(starts, ends) of the contiguous runs of equal group values —
    equality-only, no ordering assumption beyond contiguity."""
    starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
    return starts, np.append(starts[1:], g.size)


def _stream_grouped(proj: DataFrame, group_col: str, batch_fn, out_schema: str) -> DataFrame:
    """One hash shuffle on the group key, in-partition ``(group, ts)``
    sort, then a SINGLE streaming ``mapInPandas`` pass.

    ``applyInPandas`` calls Python once per group — at 1500 tiny groups
    the per-call pandas overhead dominates the kernel (measured ~2.3 s
    of pure machinery at sf0.1). Here each Arrow batch is one call and
    ``batch_fn`` vectorizes across all complete groups in it; a group
    split across batch boundaries is carried into the next batch (group
    rows are contiguous after the sort). Same shuffle count, O(batch)
    memory, ~1500× fewer Python crossings.
    """
    srt = proj.repartition(group_col).sortWithinPartitions(group_col, "__ts")

    def run(batches):
        carry = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            eq_last = (pdf[group_col].to_numpy() == pdf[group_col].iloc[-1])
            # The trailing run that matches the last group value may continue
            # into the next batch, so it is always carried — including the
            # whole batch when it is a single group (a group spanning ≥1 full
            # Arrow batch must accumulate, not emit early).
            cut = 0 if eq_last.all() else len(pdf) - int(eq_last[::-1].argmin())
            carry = pdf.iloc[cut:]
            body = pdf.iloc[:cut]
            if len(body):
                yield batch_fn(body)
        if carry is not None and len(carry):
            yield batch_fn(carry)

    return srt.mapInPandas(run, out_schema)


_FUNNEL_MODES = ("default", "deduplication", "fixed", "increase")


def window_funnel(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    window_seconds: float,
    conds: list[Column],
    mode: str = "default",
) -> DataFrame:
    """Doris ``WINDOW_FUNNEL(window, mode, ts, cond1, ...)`` per
    group → (group_col, funnel_level).

    Modes (Doris semantics):

    - ``default`` — greedy chain within the window.
    - ``deduplication`` — a repeat of an already-matched condition
      before the next step is found interrupts the chain.
    - ``fixed`` — ANY other tracked condition firing before the next
      step interrupts the chain (steps must be consecutive among
      tracked events).
    - ``increase`` — each step's timestamp must be strictly greater
      than the previous step's.

    Plan: project the condition flags (native), one hash shuffle on the
    group key, in-partition sort, then one streaming Arrow pass
    (:func:`_stream_grouped`). ``default``/``increase`` run the
    vectorized kernel; the interrupt modes run a per-chain scan kernel
    (still numpy row access, bounded by the window span).
    """
    if mode not in _FUNNEL_MODES:
        raise ValueError(f"mode must be one of {_FUNNEL_MODES}")
    flag_cols = [c.cast("boolean").alias(f"__f{i}") for i, c in enumerate(conds)]
    proj = df.select(F.col(group_col), F.col(ts_col).alias("__ts"), *flag_cols)
    n_conds = len(conds)
    window_ns = int(round(window_seconds * 1e9))
    core = (
        _funnel_core
        if mode == "default"
        else _funnel_core_increase
        if mode == "increase"
        else (lambda t, fl, w: _funnel_core_interrupt(t, fl, w, mode))
    )

    def batch_fn(body: pd.DataFrame) -> pd.DataFrame:
        g = body[group_col].to_numpy()
        t = body["__ts"].astype("datetime64[ns]").astype("int64").to_numpy()
        fl = [
            body[f"__f{i}"].fillna(False).to_numpy().astype(bool) for i in range(n_conds)
        ]
        starts, ends = _group_bounds(g)
        levels = [
            core(t[s:e], [f[s:e] for f in fl], window_ns)
            for s, e in zip(starts, ends)
        ]
        return pd.DataFrame({group_col: g[starts], "funnel_level": levels})

    return _stream_grouped(proj, group_col, batch_fn, f"{group_col} long, funnel_level int")


def _funnel_core_increase(t: np.ndarray, fl: list[np.ndarray], window_ns: int) -> int:
    """'increase' mode: same greedy chain as :func:`_funnel_core`, but
    each step must have a STRICTLY greater timestamp than the previous
    step. Vectorized identically — the per-chain "first event of cond k
    after my position with t > t[pos]" is one searchsorted over cond-k's
    (sorted) timestamps, and if that first one misses the deadline every
    later one does too."""
    starts = np.flatnonzero(fl[0])
    if starts.size == 0:
        return 0
    deadline = t[starts] + window_ns
    pos = starts
    best = 1
    for step in range(1, len(fl)):
        idxs = np.flatnonzero(fl[step])
        if idxs.size == 0:
            break
        # first cond-step event with timestamp strictly after t[pos]
        j = np.searchsorted(t[idxs], t[pos], side="right")
        has = j < idxs.size
        nxt = idxs[np.minimum(j, idxs.size - 1)]
        alive = has & (t[nxt] <= deadline)
        if not alive.any():
            break
        pos, deadline = nxt[alive], deadline[alive]
        best = step + 1
    return best


def _funnel_core_interrupt(
    t: np.ndarray, fl: list[np.ndarray], window_ns: int, mode: str
) -> int:
    """'deduplication' / 'fixed' modes: per-chain forward scan. Between
    the current step and the candidate next step, an interrupting event
    kills the chain at its current level — a repeat of an
    already-matched condition (deduplication) or ANY tracked condition
    other than the expected next one (fixed)."""
    n = t.size
    best = 0
    any_tracked = np.logical_or.reduce(fl)
    for s in np.flatnonzero(fl[0]):
        deadline = t[s] + window_ns
        pos, level = s, 1
        for step in range(1, len(fl)):
            nxt = -1
            dead = False
            for i in range(pos + 1, n):
                if t[i] > deadline:
                    break
                if fl[step][i]:
                    nxt = i
                    break
                if mode == "deduplication":
                    if any(fl[m][i] for m in range(step)):
                        dead = True
                        break
                else:  # fixed: any tracked condition out of order interrupts
                    if any_tracked[i]:
                        dead = True
                        break
            if nxt < 0 or dead:
                break
            pos, level = nxt, level + 1
        best = max(best, level)
        if best == len(fl):
            break
    return best


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
            # Non-greedy: SEQUENCE_COUNT counts non-overlapping *minimal*
            # chains (ClickHouse restarts after each match); greedy '.*'
            # would swallow later chain starts and undercount. For the
            # boolean SEQUENCE_MATCH path greediness is irrelevant.
            out.append(".*?")
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
    order = pdf["__ts"].argsort(kind="stable").to_numpy()
    flags = np.stack(
        [pdf[f"__f{i}"].fillna(False).to_numpy().astype(bool)[order] for i in range(n_conds)]
    )
    return _letters(flags)


def _letters(flags: np.ndarray) -> str:
    """Condition-alphabet string of a (n_conds × n_events) boolean
    matrix already in time order."""
    matched = flags.any(axis=0)
    first = flags.argmax(axis=0)  # index of first True per event (argmax on bool)
    return (ord("a") + first[matched]).astype(np.uint8).tobytes().decode("ascii")


def _sequence_op(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    pattern: str,
    conds: list[Column],
    out_col: str,
    out_type: str,
    per_string,
) -> DataFrame:
    proj, n = _sequence_df(df, group_col, ts_col, conds)
    rx = _compile_pattern(pattern, n)

    def batch_fn(body: pd.DataFrame) -> pd.DataFrame:
        g = body[group_col].to_numpy()
        flags = np.stack(
            [body[f"__f{i}"].fillna(False).to_numpy().astype(bool) for i in range(n)]
        )
        starts, ends = _group_bounds(g)
        vals = [per_string(rx, _letters(flags[:, s:e])) for s, e in zip(starts, ends)]
        return pd.DataFrame({group_col: g[starts], out_col: vals})

    return _stream_grouped(proj, group_col, batch_fn, f"{group_col} long, {out_col} {out_type}")


def sequence_match(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    pattern: str,
    conds: list[Column],
) -> DataFrame:
    """Doris ``SEQUENCE_MATCH('(?1).*(?2)', ts, cond...)`` per group →
    (group_col, matched: boolean)."""
    return _sequence_op(
        df, group_col, ts_col, pattern, conds,
        "matched", "boolean", lambda rx, s: rx.search(s) is not None,
    )


def sequence_count(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    pattern: str,
    conds: list[Column],
) -> DataFrame:
    """Doris ``SEQUENCE_COUNT`` — non-overlapping pattern matches per
    group → (group_col, n_matches)."""
    return _sequence_op(
        df, group_col, ts_col, pattern, conds,
        "n_matches", "int", lambda rx, s: len(rx.findall(s)),
    )
