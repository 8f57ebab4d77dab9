"""Partition-incremental rollup: per-partition aggregate cache with
partition-version invalidation (Doris 2.1 partition-level async-MV
refresh [upstream: fe/.../mtmv/MTMVPartitionUtil.java — "partition is
sync" checks], and the FE partition cache's invalidation model).

Why this exists next to ``plans.Rollup``: the additive ``apply_delta``
path is exact for DUPLICATE/AGGREGATE loads but an UPSERT is not
additive, so UNIQUE tables fall back to FULL refresh there. When the
base table is AUTO-PARTITIONed on a key column, every upsert's effect
is confined to its own partitions — so refreshing ONLY the partitions
whose version moved is exact for ALL key models, including UNIQUE and
predicate DELETEs (conservatively: deletes bump every partition).

Mechanics: the store holds one parquet dir per (partition, version);
``read()`` diffs ``table.partition_versions()`` against the store's
ledger, recomputes only stale partitions (each through the table's own
merge-on-read view restricted to that partition — correct because the
partition column is a key column), then unions the per-partition
aggregates and re-merges them. At 100 TB with daily partitions, a
day's late data recomputes one day's aggregate, not the table.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, functions as F

from palo_spark.plans import Measure
from palo_spark.tables import AUTO_PART_COL, Table

_LEDGER = "_partition_rollup.json"


class PartitionRollup:
    def __init__(
        self,
        table: Table,
        group_cols: list[str],
        measures: list[Measure],
        store: str,
    ) -> None:
        if not table.meta.auto_partition:
            raise ValueError("PartitionRollup requires an auto_partition table")
        self.table = table
        self.group_cols = list(group_cols)
        self.measures = list(measures)
        self.store = store
        os.makedirs(store, exist_ok=True)
        self._versions: dict[str, int] = {}
        self._load_ledger()
        #: partitions recomputed by the last read() — observability for
        #: tests and operators ("how much did this refresh cost?")
        self.last_refreshed: list[str] = []
        #: lazy store-read handle cache (r13, the tables._ROWSET_CACHE
        #: posture): key = the (dir, st_mtime_ns) tuple of every live
        #: partition dir. A refresh swaps a partition dir wholesale via
        #: os.replace (fresh inode → fresh mtime), so the key changes
        #: whenever ANY store file a cached handle listed can have
        #: vanished — including refreshes committed by another handle
        #: of the same store. The cached object is an immutable lazy
        #: plan over ~80 dirs (~100 ms of listing/schema inference per
        #: construction); no rows are held.
        self._read_handle: tuple[tuple, DataFrame] | None = None

    # ------------------------------------------------------------ ledger

    def _ledger_path(self) -> str:
        return os.path.join(self.store, _LEDGER)

    def _load_ledger(self) -> None:
        try:
            with open(self._ledger_path()) as f:
                self._versions = json.load(f)
        except FileNotFoundError:
            self._versions = {}

    def _save_ledger(self) -> None:
        tmp = self._ledger_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._versions, f)
        os.replace(tmp, self._ledger_path())

    def _part_dir(self, label: str) -> str:
        return os.path.join(self.store, f"p_{label}")

    # ------------------------------------------------------------- read

    def refresh(self) -> list[str]:
        """Bring the store in sync with the base table; returns the
        partition labels that were recomputed (or dropped)."""
        current = self.table.partition_versions()
        touched: list[str] = []
        # dropped partitions: remove their aggregates
        for lbl in list(self._versions):
            if lbl not in current:
                shutil.rmtree(self._part_dir(lbl), ignore_errors=True)
                del self._versions[lbl]
                touched.append(lbl)
        stale = [
            lbl for lbl, ver in current.items() if self._versions.get(lbl) != ver
        ]  # everything else is sync (Doris MTMV wording)
        if stale:
            # ONE job refreshes every stale partition: the merge-on-read
            # view restricted to the stale labels (directory-pruned),
            # aggregated per (partition, group) — exact for any key
            # model because the partition column is a key column —
            # written out partitioned by label, then each label dir
            # moved into the store. Refresh cost scales with the stale
            # data volume, never with job-count × fixed overhead.
            part_view = self.table.read(
                partition_pred=F.col(AUTO_PART_COL).isin(stale)
            )
            agg = part_view.groupBy(AUTO_PART_COL, *self.group_cols).agg(
                *[m.store_expr() for m in self.measures]
            )
            tmp = os.path.join(self.store, "_refresh.tmp")
            shutil.rmtree(tmp, ignore_errors=True)
            # hash-distribute by label before the partitionBy write
            # (r12, same posture as Table._write_rowset): the aggregate
            # is post-shuffle and AQE-coalesced, so without this ONE
            # task wrote every stale label's file sequentially (~80
            # writer opens per refresh); with it labels land on
            # distinct tasks and write in parallel, one file per label.
            agg.repartition(F.col(AUTO_PART_COL)).write.partitionBy(
                AUTO_PART_COL
            ).parquet(tmp)
            for lbl in stale:
                src = os.path.join(tmp, f"{AUTO_PART_COL}={lbl}")
                shutil.rmtree(self._part_dir(lbl), ignore_errors=True)
                if os.path.isdir(src):
                    os.replace(src, self._part_dir(lbl))
                # else: partition exists but has no live rows (all
                # deleted) — no store dir; read() skips it
                self._versions[lbl] = current[lbl]
                touched.append(lbl)
            shutil.rmtree(tmp, ignore_errors=True)
        if touched:
            self._save_ledger()
        return touched

    def read(self) -> DataFrame:
        """The rollup's current contents (refreshing stale partitions
        first): per-partition aggregates re-merged across partitions."""
        self.last_refreshed = self.refresh()
        spark = self.table.spark
        dirs = [
            self._part_dir(lbl)
            for lbl in sorted(self._versions)
            if os.path.isdir(self._part_dir(lbl))
        ]
        if not dirs:
            raise ValueError("partition rollup is empty (no partitions)")
        key = (id(spark),) + tuple((d, os.stat(d).st_mtime_ns) for d in dirs)
        if self._read_handle is not None and self._read_handle[0] == key:
            df = self._read_handle[1]
        else:
            df = spark.read.parquet(*dirs)
            self._read_handle = (key, df)
        merged = df.groupBy(*self.group_cols).agg(
            *[m.merge_expr() for m in self.measures]
        )
        return merged.select(
            *self.group_cols, *[m.present_expr() for m in self.measures]
        )
