"""Caller-visible lifecycle for operator-internal persisted stages.

Operators like :func:`dedup_minhash` and :func:`tfidf_top_terms` persist
an intermediate stage that feeds multiple branches of their own plan
(signatures, term stats). Spark offers no "unpersist when my consumers
finish" hook for a lazily-returned DataFrame, so the frames are tracked
here and the CALLER releases them once the returned DataFrame has been
fully consumed::

    out = dedup_minhash(df).collect()
    release_persisted()          # drop operator-internal caches

CONTRACT: :func:`release_persisted` with no argument unpersists EVERY
tracked frame — call it only when no operator output is still pending
consumption (the bench/sequential-query pattern). Interleaved pipelines
(several operator results built lazily, consumed later, possibly from
threads) must release per operator instead::

    dd = dedup_minhash(df)                   # persists under tag "dedup_minhash"
    tf = tfidf_top_terms(docs)               # persists under tag "tfidf"
    dd.collect(); release_persisted("dedup_minhash")   # tf's caches intact
    tf.collect(); release_persisted("tfidf")

A frame released early is not corrupted — Spark silently recomputes it —
but the operator's multi-branch plan then re-runs the stage per branch,
which is exactly the cost the persist existed to avoid.

Long sessions that interleave many operators (benchmarks, notebooks)
should release between queries — leaked caches accumulate and push later
queries into GC/eviction (measured 10× inflation in round-3 bench runs).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_PERSISTED: list[tuple[str, DataFrame]] = []


def _persist(df: DataFrame, tag: str = "") -> DataFrame:
    """Persist (MEMORY_AND_DISK: spill, never OOM) and track for
    :func:`release_persisted` under ``tag`` (the operator name)."""
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _PERSISTED.append((tag, df))
    return df


def release_persisted(tag: str | None = None) -> int:
    """Unpersist tracked operator-internal caches; returns how many were
    released. With ``tag``, releases only frames persisted under that
    tag (safe while other operators' outputs are still pending); with no
    argument, releases everything — see the module contract above."""
    n = 0
    keep: list[tuple[str, DataFrame]] = []
    while _PERSISTED:
        t, df = _PERSISTED.pop()
        if tag is not None and t != tag:
            keep.append((t, df))
            continue
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    _PERSISTED.extend(reversed(keep))
    return n
