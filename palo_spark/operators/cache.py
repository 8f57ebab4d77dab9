"""Caller-visible lifecycle for operator-internal persisted stages.

Operators like :func:`dedup_minhash` and :func:`tfidf_top_terms` persist
an intermediate stage that feeds multiple branches of their own plan
(signatures, term stats). Spark offers no "unpersist when my consumers
finish" hook for a lazily-returned DataFrame, so the frames are tracked
here and the CALLER releases them once the returned DataFrame has been
fully consumed::

    out = dedup_minhash(df).collect()
    release_persisted()          # drop operator-internal caches

Long sessions that interleave many operators (benchmarks, notebooks)
should call :func:`release_persisted` between queries — leaked caches
accumulate and push later queries into GC/eviction (measured 10×
inflation in round-3 bench runs).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []


def _persist(df: DataFrame) -> DataFrame:
    """Persist (MEMORY_AND_DISK: spill, never OOM) and track for
    :func:`release_persisted`."""
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _PERSISTED.append(df)
    return df


def release_persisted() -> int:
    """Unpersist every operator-internal cache created since the last
    call; returns how many were released."""
    n = 0
    while _PERSISTED:
        df = _PERSISTED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return n
