"""The three Doris table models as insert-time semantics + merge-on-read
views (SURVEY.md §1.2; upstream ``fe/.../catalog/KeysType.java``,
``AggregateType.java``; docs: data-model).

A :class:`Table` is a managed directory of immutable **rowsets** (one
parquet dir per ``insert``, stamped with a monotonically increasing
version — the same structure as Doris rowsets/versions). Queries read a
**merge-on-read view**; :meth:`compact` materializes that view back into
a single rowset (Doris base compaction).

Model semantics:

- ``DUPLICATE`` — append-only; the view is a plain union of rowsets.
- ``UNIQUE`` — upsert: for each key, the row from the highest version
  wins (merge-on-read, ``row_number() == 1`` over a version-descending
  window — one hash shuffle on the key, exactly the distribution Doris
  uses). An optional **sequence column** (Doris
  ``function_column.sequence_col``) breaks ties *within* a version;
  without one, in-batch duplicate keys are resolved arbitrarily (same
  contract as Doris). ``insert(df, partial_columns=True)`` is Doris 2.0
  partial-column update: the batch carries keys + a subset of value
  columns and only those are overwritten — resolution is column-wise at
  read (newest rowset that CARRIES the column wins; a stored NULL
  overwrites, an absent column preserves).
- ``AGGREGATE`` — each value column carries an aggregate type:
  ``SUM | MIN | MAX | REPLACE | REPLACE_IF_NOT_NULL``; rows with equal
  keys are pre-merged. SUM/MIN/MAX are associative so batch order is
  irrelevant; REPLACE takes the value at the highest version
  (``max_by(col, version)``), REPLACE_IF_NOT_NULL the latest non-null.

Scale design: ``insert`` is a distributed parquet append (no driver
data); the merge view is one key-shuffle (window or hash-agg), which AQE
sizes at runtime; ``compact`` bounds read amplification exactly like
Doris compaction — at 100 TB you compact when rowset count grows, and
the view cost is O(live rowsets).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import tempfile
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_VERSION_COL = "__palo_version"
#: per-rowset literal listing which value columns the rowset CARRIES —
#: the presence signal partial-column updates need (a stored NULL must
#: overwrite, an absent column must not; post-union NULLs cannot tell
#: those apart, a per-rowset constant can)
_PCOLS_COL = "__palo_pcols"
_META_FILE = "_palo_table.json"
#: hive partition directory column for AUTO PARTITION BY RANGE tables
AUTO_PART_COL = "_auto_part"
#: Doris's hidden batch-delete column (UNIQUE model MERGE loads /
#: ``merge_type=MERGE ... DELETE ON``): a load row carrying 1 here marks
#: its key deleted; the key disappears if that row wins the merge
DELETE_SIGN_COL = "__DORIS_DELETE_SIGN__"

#: rows-per-label threshold above which partitioned unbucketed writes
#: salt WITHIN the label (see Table._label_salted_exprs). 0 = off.
HOT_LABEL_THRESHOLD_CONF = "palo_spark.write.hotLabelRowThreshold"

KEYS_TYPES = ("DUPLICATE", "UNIQUE", "AGGREGATE")
#: BITMAP_UNION / HLL_UNION / QUANTILE_UNION merge serialized sketch
#: states (Doris's pre-aggregated distinct-count / quantile table
#: pattern); the column stores the sketch bytes, loads provide states
#: built with functions.sketches (to_bitmap / bitmap_union_of_values,
#: hll_state, quantile_state_of_values)
AGG_TYPES = (
    "SUM", "MIN", "MAX", "REPLACE", "REPLACE_IF_NOT_NULL",
    "BITMAP_UNION", "HLL_UNION", "QUANTILE_UNION",
)

#: AUTO PARTITION granularities → partition-label formats (Spark
#: date_format patterns; labels sort lexicographically in time order,
#: which is what makes label-range pruning equivalent to time-range
#: pruning)
AUTO_PART_FMT = {
    "hour": "yyyy-MM-dd-HH",
    "day": "yyyy-MM-dd",
    "month": "yyyy-MM",
    "year": "yyyy",
    # Doris 2.1 AUTO PARTITION BY LIST(col): one partition per distinct
    # column VALUE — the label is the value itself (no date bucketing),
    # so the format entry is unused; the "l" prefix rule still applies
    "list": None,
}


#: Lazy rowset-read-handle cache (r13; the catalog.py table-handle
#: pattern applied to managed-table storage). ``spark.read.parquet``
#: costs ~70 ms per call even warm (footer/schema inference through
#: py4j); a table-model entry re-reads each rowset 2-5× per query and
#: paid ~2 s/bench of pure plan construction (measured r12/r13). The
#: cached object is an IMMUTABLE LAZY PLAN — no rows; every query still
#: computes from the parquet files. Keyed like catalog._TABLE_CACHE on
#: id(spark) with the session object pinned; inner key = table
#: location, value = (lineage, storage_epoch, {rowset_path: frame}).
#: Invalidation: any operation that deletes/rewrites files under an
#: existing rowset path bumps ``TableMeta.storage_epoch`` (see there),
#: which discards the table's whole per-path dict; append-only loads
#: create NEW uuid-suffixed rowset dirs and leave prior handles valid.
#: A lineage change (DROP + re-CREATE at the same location) discards
#: the dict the same way.
_ROWSET_CACHE: dict[
    int,
    tuple[SparkSession, dict[str, tuple[str, int, dict[str, DataFrame]]]],
] = {}


def _rp_key(lit_text: str):
    """Parse a range-partition bound / predicate literal to a typed
    comparable key: ("t", datetime) | ("n", float) | ("s", str).
    Comparisons are only sound between SAME kinds — callers fail open
    on a kind mismatch."""
    from datetime import datetime

    s = str(lit_text).strip().strip("'\"")
    for p in ("%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S",
              "%Y-%m-%d %H:%M", "%Y-%m-%d"):
        try:
            return ("t", datetime.strptime(s, p))
        except ValueError:
            pass
    try:
        return ("n", float(s))
    except ValueError:
        return ("s", s)


@dataclass
class TableMeta:
    name: str
    keys_type: str
    key_cols: list[str]
    agg_spec: dict[str, str] = field(default_factory=dict)
    sequence_col: str | None = None
    partition_by: list[str] = field(default_factory=list)
    #: Doris AUTO PARTITION BY RANGE (date_trunc(col, granularity)):
    #: {"col": name, "granularity": "hour|day|month|year"} — partitions
    #: are created implicitly at load (Doris 2.1 auto-partition /
    #: dynamic-partition behavior); reads prune them via label ranges.
    auto_partition: dict | None = None
    #: classic Doris STATIC range partitioning (`PARTITION BY RANGE(col)
    #: (PARTITION p VALUES LESS THAN (...), ...)`): {"col": name,
    #: "parts": [{"name": str, "upper": raw-SQL-literal | None}]} —
    #: upper None = MAXVALUE; rows route to the first partition whose
    #: upper bound exceeds the value, a row beyond the last bound FAILS
    #: the load (Doris: no matching partition). Labels share the
    #: auto-partition hive layout, so selection/delete/drop/pruning use
    #: the same machinery. The static LIST form (`PARTITION BY LIST(col)
    #: (PARTITION p VALUES IN (...))`) uses the same slot with
    #: "kind": "list" and per-part "values" instead of bounds.
    range_partitions: dict | None = None
    #: committed rowsets: [{"version": int, "path": str, "label": str|None}]
    rowsets: list[dict] = field(default_factory=list)
    #: load labels already applied (Stream/Broker Load idempotency ledger)
    labels: list[str] = field(default_factory=list)
    #: deferred DELETE predicates: [{"version": int, "predicate": str}] —
    #: applied at read time to rowsets with version < delete version,
    #: folded into storage only by compact() (Doris delete-predicate +
    #: compaction design; no storage rewrite at delete time)
    deletes: list[dict] = field(default_factory=list)
    #: light schema change (Doris ADD COLUMN): [{"col", "type", "default"}]
    #: — no rowset is rewritten; old rowsets surface the default at read
    schema_adds: list[dict] = field(default_factory=list)
    #: compact automatically when live rowsets exceed this (0 = manual) —
    #: Doris cumulative-compaction trigger analog, bounds read amplification
    auto_compact_rowsets: int = 0
    #: True once any live rowset carries the hidden delete-sign column
    #: (UNIQUE MERGE loads); reset when compaction folds the signs away
    has_delete_sign: bool = False
    #: light schema change (Doris DROP COLUMN): final column names hidden
    #: at read — storage untouched
    schema_drops: list[str] = field(default_factory=list)
    #: light schema change (Doris MODIFY COLUMN type): {col: spark_type}
    #: cast applied per rowset at read — storage untouched, old rowsets
    #: surface the new type via cast (Doris light type change for
    #: compatible widenings)
    schema_retypes: dict = field(default_factory=dict)
    #: light schema change (Doris RENAME COLUMN): applied in order per
    #: rowset at read — storage untouched
    schema_renames: list[dict] = field(default_factory=list)
    #: keep only the newest N auto-partitions, dropping older ones at
    #: load time (Doris dynamic_partition.start retention; 0 = keep all)
    dynamic_partition_retention: int = 0
    #: declared value columns, captured at the table's FIRST full load
    #: (renames/drops maintain it): later full loads must carry exactly
    #: these (schema-add columns stay optional), because a rowset missing
    #: a value column poisons every subsequent read at the union. Empty
    #: on tables persisted before this field existed → legacy-lax.
    value_cols: list = field(default_factory=list)
    #: version high-water mark: carries the counter across TRUNCATE
    #: (which clears the rowset/delete lists the counter is otherwise
    #: derived from) so versions are never reused — the version-gated
    #: schema metadata (rename "until", re-add "since", delete gating)
    #: depends on monotonicity
    last_version: int = 0
    #: monotonic mutation counter (never decremented/reused) — bumped by
    #: every state-changing operation; see Table.state_token
    mutations: int = 0
    #: creation nonce: two tables that happen to share a name (DROP +
    #: re-CREATE, or the same name in two runs) must never be mistaken
    #: for each other by anything keying on (name, mutations) — index
    #: freshness tokens include this so a counter that RESTARTS on a new
    #: lineage cannot collide with the old one's
    lineage: str = ""
    #: DISTRIBUTED BY HASH(cols) BUCKETS n: each rowset write
    #: repartitions on these columns into n tasks — bounded file counts
    #: per load (no small-file explosion at ingest cadence) and a
    #: hash-co-located layout per rowset (Doris tablet distribution)
    dist_cols: list[str] = field(default_factory=list)
    buckets: int = 0
    #: the Doris-DDL declared schema ("name spark_type, ...") — persisted
    #: so a session re-attaching to this directory keeps typed VALUES
    #: inserts, empty-table views, DESC/SHOW CREATE. Empty on tables
    #: persisted before this field existed (legacy-lax, like value_cols).
    declared_schema: str = ""
    #: columns declared VARIANT/JSON — persisted so subscript rewriting
    #: survives session restarts
    variant_cols: list = field(default_factory=list)
    #: Doris catalog recycle bin: DROP TABLE marks the directory dropped
    #: (storage kept); session re-attach skips dropped dirs; RECOVER
    #: TABLE clears the flag
    dropped: bool = False
    #: storage epoch: bumped ONLY by operations that delete or rewrite
    #: files under EXISTING rowset paths (partition drop/truncate/
    #: replace, retention, compaction, TRUNCATE TABLE) — the
    #: invalidation key for cached lazy rowset read handles (a handle
    #: embeds the file listing taken at construction, so it survives
    #: append-only loads — which only ever CREATE new rowset dirs — but
    #: must be discarded when files it listed can have vanished).
    #: Persisted so a second handle of the same directory invalidates
    #: via _sync_meta, like ``mutations``. Tables persisted before this
    #: field existed default to 0 and start counting at their first
    #: deletion-class mutation.
    storage_epoch: int = 0


class Table:
    """A managed table with Doris key-model semantics on parquet storage."""

    def __init__(
        self,
        spark: SparkSession,
        name: str,
        keys_type: str,
        key_cols: list[str],
        agg_spec: dict[str, str] | None = None,
        sequence_col: str | None = None,
        partition_by: list[str] | None = None,
        location: str | None = None,
        auto_compact_rowsets: int = 0,
        auto_partition: tuple[str, str] | None = None,
        range_partitions: dict | None = None,
        dynamic_partition_retention: int = 0,
        dist_cols: list[str] | None = None,
        buckets: int = 0,
    ) -> None:
        keys_type = keys_type.upper()
        if keys_type not in KEYS_TYPES:
            raise ValueError(f"keys_type must be one of {KEYS_TYPES}")
        if not key_cols:
            raise ValueError("key_cols must be non-empty")
        agg_spec = {k: v.upper() for k, v in (agg_spec or {}).items()}
        for c, a in agg_spec.items():
            if a not in AGG_TYPES:
                raise ValueError(f"unknown aggregate type {a!r} for column {c!r}")
            if c in key_cols:
                raise ValueError(f"key column {c!r} cannot carry an aggregate type")
        if keys_type == "AGGREGATE" and not agg_spec:
            raise ValueError("AGGREGATE keys_type requires agg_spec")
        if keys_type != "AGGREGATE" and agg_spec:
            raise ValueError("agg_spec only applies to AGGREGATE keys_type")
        if sequence_col and keys_type != "UNIQUE":
            raise ValueError("sequence_col only applies to UNIQUE keys_type")
        ap = None
        if auto_partition is not None:
            pcol, gran = auto_partition
            gran = gran.lower()
            if gran not in AUTO_PART_FMT:
                raise ValueError(
                    f"auto_partition granularity must be one of {sorted(AUTO_PART_FMT)}"
                )
            # Doris requires the partition column to be a key column on
            # UNIQUE/AGGREGATE models — that is what makes pruning sound
            # *before* the merge view (all versions of a logical row share
            # one partition, since key values are immutable).
            if keys_type != "DUPLICATE" and pcol not in key_cols:
                raise ValueError(
                    "auto_partition column must be a key column on "
                    f"{keys_type} tables (Doris partition-key rule)"
                )
            ap = {"col": pcol, "granularity": gran}
        if range_partitions is not None:
            if ap is not None:
                raise ValueError(
                    "range_partitions and auto_partition are exclusive"
                )
            rcol = range_partitions["col"]
            rparts = range_partitions["parts"]
            if not rparts:
                raise ValueError("range_partitions needs at least one partition")
            names = [p["name"] for p in rparts]
            if len(set(names)) != len(names):
                raise ValueError(f"duplicate partition names: {names}")
            if range_partitions.get("kind") == "list":
                seen_vals: set[str] = set()
                for p in rparts:
                    for v in p["values"]:
                        if v in seen_vals:
                            raise ValueError(
                                f"value {v!r} appears in two partitions"
                            )
                        seen_vals.add(v)
            else:
                for p in rparts[:-1]:
                    if p["upper"] is None:
                        raise ValueError(
                            "MAXVALUE is only allowed on the LAST partition"
                        )
                keys = [
                    _rp_key(p["upper"]) for p in rparts
                    if p["upper"] is not None
                ]
                if len({k[0] for k in keys}) > 1 or keys != sorted(keys):
                    raise ValueError(
                        "partition upper bounds must be same-typed and "
                        f"strictly increasing: {[p['upper'] for p in rparts]}"
                    )
            if keys_type != "DUPLICATE" and rcol not in key_cols:
                raise ValueError(
                    "range partition column must be a key column on "
                    f"{keys_type} tables (Doris partition-key rule)"
                )
            # materialize each partition's LOWER bound (the previous
            # upper): dropping a MIDDLE partition must leave a HOLE —
            # rows in the dropped range fail to load rather than folding
            # into the next partition. (List parts carry explicit value
            # sets instead of bounds.)
            if range_partitions.get("kind") != "list":
                prev = None
                for p in rparts:
                    p.setdefault("lower", prev)
                    prev = p["upper"]

        self.spark = spark
        self.location = location or tempfile.mkdtemp(prefix=f"palo_{name}_")
        os.makedirs(self.location, exist_ok=True)
        #: post-commit load listeners (fn(batch_df)) — how rollups are
        #: maintained synchronously on load (RollupCatalog.attach_table);
        #: runtime-only, not persisted in meta
        self._on_insert: list = []
        self.meta = TableMeta(
            name=name,
            keys_type=keys_type,
            key_cols=list(key_cols),
            agg_spec=agg_spec,
            sequence_col=sequence_col,
            partition_by=list(partition_by or []),
            auto_compact_rowsets=int(auto_compact_rowsets),
            auto_partition=ap,
            range_partitions=range_partitions,
            dynamic_partition_retention=int(dynamic_partition_retention),
            dist_cols=list(dist_cols or []),
            buckets=int(buckets),
            lineage=uuid.uuid4().hex,
        )
        if dynamic_partition_retention and ap is None:
            raise ValueError(
                "dynamic_partition_retention requires auto_partition"
            )
        self._save_meta()

    # ------------------------------------------------------------- storage

    def _save_meta(self) -> None:
        # every persisted state change bumps the mutation counter (the
        # result-cache invalidation token)
        self.meta.mutations += 1
        tmp = os.path.join(self.location, f".{_META_FILE}.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(self.meta.__dict__, f)
        os.replace(tmp, os.path.join(self.location, _META_FILE))

    @classmethod
    def open(cls, spark: SparkSession, location: str) -> "Table":
        """Re-attach to an existing table directory."""
        with open(os.path.join(location, _META_FILE)) as f:
            d = json.load(f)
        t = cls.__new__(cls)
        t.spark = spark
        t.location = location
        t.meta = TableMeta(**d)
        t._on_insert = []
        return t

    @property
    def _declared_schema(self) -> str | None:
        """Doris-DDL declared schema, persisted in meta (r10: survives
        session re-attach). None when unknown — tables created through
        the Python API rather than session DDL."""
        return self.meta.declared_schema or None

    @_declared_schema.setter
    def _declared_schema(self, v: str | None) -> None:
        self.meta.declared_schema = v or ""
        self._save_meta()

    @property
    def _variant_cols(self) -> set:
        return set(self.meta.variant_cols)

    @_variant_cols.setter
    def _variant_cols(self, v) -> None:
        self.meta.variant_cols = sorted(v)
        self._save_meta()

    @property
    def _next_version(self) -> int:
        hi = max((r["version"] for r in self.meta.rowsets), default=0)
        hi = max(hi, max((d["version"] for d in self.meta.deletes), default=0))
        # versions must be MONOTONIC for the table's lifetime: the
        # version-gated schema metadata (rename "until", re-add "since",
        # delete versions) compares against them, so a counter that
        # restarted after TRUNCATE cleared the rowset/delete lists made
        # old boundaries apply to NEW rowsets (observed: a truncated
        # table's first new rowset got version 1 < a rename's until=2,
        # the mapping renamed its reused column onto the renamed one,
        # and the read collapsed into duplicate columns)
        hi = max(hi, self.meta.last_version)
        return hi + 1

    # -------------------------------------------------------------- writes

    def insert(
        self,
        df: DataFrame,
        label: str | None = None,
        partial_columns: bool = False,
        temp_partition: str | None = None,
    ) -> int:
        """Load one batch as a new rowset; returns the committed version.

        ``label`` is the Stream/Broker-Load idempotency key: re-inserting
        an already-applied label is a no-op (Doris label dedup ledger).
        The write lands in a temp dir first and is committed by a single
        metadata update — a failed job leaves no visible partial rowset.

        ``partial_columns=True`` is Doris 2.0 partial-column update
        (stream-load ``partial_columns:true`` / ``UPDATE`` on the UNIQUE
        model): the batch carries the key columns plus a SUBSET of value
        columns, and only those columns are overwritten — every other
        column keeps its previous value per key. The rowset stores only
        the carried columns; resolution happens column-wise at read time
        (see :meth:`read`), so a partial load of 2 columns on a 100-column
        table writes 2 columns, never a row rewrite. Contract (upstream
        parity): UNIQUE key model only, no sequence column, batches are
        key-unique, and a partially-updated key that never had a full row
        surfaces NULL for the columns no load ever carried.
        """
        if label is not None and label in self.meta.labels:
            return -1  # already applied — idempotent no-op
        carries_sign = DELETE_SIGN_COL in df.columns
        if carries_sign:
            if self.meta.keys_type != "UNIQUE":
                raise ValueError(
                    f"{DELETE_SIGN_COL} requires the UNIQUE key model "
                    "(Doris batch-delete restriction)"
                )
            if partial_columns:
                raise ValueError(
                    "a partial-column batch may not carry "
                    f"{DELETE_SIGN_COL}"
                )
            if any(r.get("partial") for r in self.meta.rowsets):
                raise ValueError(
                    "delete-sign loads cannot mix with live partial-column "
                    "rowsets — compact() first"
                )
        elif partial_columns and self.meta.has_delete_sign:
            raise ValueError(
                "partial-column loads cannot mix with live delete-sign "
                "rowsets — compact() first"
            )
        partial_cols: list[str] | None = None
        if partial_columns:
            partial_cols = self._check_partial_schema(df)
        else:
            self._check_schema(df)
            if not self.meta.value_cols and not self.meta.rowsets:
                # capture the declared value schema at the first full
                # load; every later load validates against it
                self.meta.value_cols = [
                    c
                    for c in df.columns
                    if c not in self.meta.key_cols
                    and c != self.meta.sequence_col
                    and c not in (DELETE_SIGN_COL, AUTO_PART_COL)
                ]
        if temp_partition is not None:
            rp_ = self.meta.range_partitions
            if rp_ is None or not any(
                p["name"] == temp_partition for p in rp_.get("temp", [])
            ):
                raise ValueError(
                    f"unknown temporary partition {temp_partition!r}"
                )
        version = self._next_version
        path = os.path.join(self.location, f"rowset_v{version}_{uuid.uuid4().hex[:8]}")
        self._write_rowset(df, path, temp_partition=temp_partition)
        self.meta.rowsets.append(
            {
                "version": version,
                "path": path,
                "label": label,
                # auto-partition labels this rowset touched (from the
                # written directory listing — free); the basis for
                # partition-level versioning / incremental MV refresh
                "partitions": self._labels_of(path),
                # value columns this rowset carries, when it is a
                # partial-column update (absent key = full-schema rowset)
                **({"partial": partial_cols} if partial_cols else {}),
                # whether this rowset carries the hidden delete sign —
                # lets drop_partition recompute meta.has_delete_sign when
                # the last sign-carrying rowset expires. Always explicit
                # (True/False): a MISSING key means metadata persisted
                # before this flag existed, which drop_partition treats
                # conservatively (never clears the table flag on a
                # legacy rowset's behalf)
                "sign": carries_sign,
            }
        )
        if carries_sign:
            self.meta.has_delete_sign = True
        if label is not None:
            self.meta.labels.append(label)
        self._save_meta()
        # cumulative-compaction trigger: bound merge-on-read amplification
        # (Doris compacts when rowset count grows; the threshold trades
        # write amplification against read fan-in — at 100 TB you set it
        # per ingest cadence, the mechanism is identical)
        if (
            self.meta.auto_compact_rowsets
            and len(self.meta.rowsets) > self.meta.auto_compact_rowsets
        ):
            self.compact()
        self._apply_retention()
        for cb in self._on_insert:
            cb(df)
        return version

    def delete_where(self, condition: str) -> int:
        """Doris DELETE: record the predicate in table meta — NO storage
        is touched. At read time the predicate filters rows from every
        rowset loaded *before* the delete (later inserts are unaffected,
        exactly Doris's delete-version semantics); :meth:`compact` folds
        accumulated predicates back into storage.

        This is the 100 TB-safe path: a predicate delete on a petabyte
        table is a metadata write, not a full (or even partial) rewrite —
        readers pay one extra native filter per live delete until the
        next compaction, identical to Doris's delete-predicate design.

        ``condition`` must be a SQL predicate string (it is persisted in
        ``_palo_table.json``; Doris likewise restricts DELETE to simple
        column predicates). Rows for which the predicate is NULL are
        kept — only TRUE matches delete. Returns the delete's version.

        Semantics note: the predicate filters stored ROWS (version-gated)
        before any merge — the delete-predicate design. On an AGGREGATE
        table value-column conditions are therefore rejected (key columns
        only, the Doris rule — a value condition would drop individual
        deltas and corrupt the aggregate). On a UNIQUE table value-column
        conditions are allowed and act on each stored version: deleting a
        newer matching version exposes an older non-matching one. For
        merge-level deletes on UNIQUE tables use delete-sign MERGE loads.
        """
        if not isinstance(condition, str):
            raise TypeError(
                "delete_where requires a SQL predicate string (it is "
                "persisted in table meta and applied at read time); got "
                f"{type(condition).__name__}"
            )
        F.expr(condition)  # fail fast on unparseable predicates
        if self.meta.keys_type == "AGGREGATE":
            # Doris rule: DELETE conditions on an AGGREGATE table may
            # reference key columns only. The predicate filters stored
            # delta rows BEFORE the merge, so a value-column condition
            # would drop individual deltas and silently corrupt the
            # aggregate (e.g. SUM rows +10,-3 with 'val>5' leaves -3).
            # Key-column predicates are exact: every delta of a key
            # matches uniformly. Resolution check against a keys-only
            # frame; types don't matter for name resolution.
            probe = self.spark.createDataFrame(
                [], ", ".join(f"`{c}` string" for c in self.meta.key_cols)
            )
            try:
                probe.filter(F.expr(condition))
            except Exception:
                raise ValueError(
                    "DELETE on an AGGREGATE table may reference key "
                    f"columns only ({self.meta.key_cols}); got "
                    f"{condition!r}"
                ) from None
        if any(r.get("partial") for r in self.meta.rowsets):
            # The predicate binds per stored row BEFORE the column-wise
            # merge; a live partial rowset's uncarried columns are NULL
            # there, so a delete matching the MERGED row would miss the
            # overlay and strip the base row instead (leaving the key
            # visible with NULLed columns). Fold the overlay FIRST —
            # compaction materializes the merged state, making the
            # per-row predicate exact again. Implicit (not a refusal)
            # because UPDATE takes the partial-load path internally, so
            # UPDATE-then-DELETE is an everyday sequence; the rewrite
            # cost is the price of predicate-exactness over an overlay
            # (Doris's merge-on-write keeps this state continuously).
            self.compact()
        version = self._next_version
        self.meta.deletes.append({"version": version, "predicate": condition})
        self._save_meta()
        return version

    def _guard_delete_predicate_capture(self, col: str) -> None:
        """Refuse to introduce column name ``col`` while a pending DELETE
        predicate references it: predicates are stored as SQL text and
        bound at read time, so a NEW column under an old referenced name
        would capture the predicate and delete the wrong rows. (Spark's
        analyzer resolves renamed/dropped attributes through the plan, so
        predicates over the ORIGINAL column keep working — only name
        reuse is unsound.) compact() folds predicates away and lifts the
        restriction, mirroring Doris's pending-job schema-change limits."""
        # Match bare and backtick-quoted spellings: the predicate text may
        # reference the column as `col` (the MySQL dialect translate()
        # accepts), and the quoted form binds to the same attribute at
        # read — so it must trip the guard too. Stripping backticks first
        # normalizes both spellings to one pattern.
        pat = re.compile(rf"(?<![A-Za-z0-9_]){re.escape(col)}(?![A-Za-z0-9_])")
        for d in self.meta.deletes:
            if pat.search(d["predicate"].replace("`", "")):
                raise ValueError(
                    f"pending DELETE predicate {d['predicate']!r} references "
                    f"column name {col!r}; compact() before reusing the name"
                )

    def add_column(
        self, col: str, col_type: str, default=None, agg: str | None = None
    ) -> None:
        """Doris light schema change (ALTER TABLE ADD COLUMN): a
        metadata-only operation — NO rowset is rewritten. Rowsets loaded
        before the change (and later loads that omit the column) surface
        ``default`` at read; loads that include the column keep their
        values, including explicit NULLs. ``agg`` adds the column to an
        AGGREGATE table's merge spec.

        On an AGGREGATE table the default fills per STORED DELTA ROW
        before the merge (upstream behavior), so a non-zero default on a
        SUM column contributes once per unmerged load of a key and again
        for every later load that omits the column — use default 0 for
        SUM columns unless that is what you want. Compaction is value-
        neutral either way (pinned)."""
        if (
            col in self.meta.key_cols
            or col in self.meta.value_cols
            or any(a["col"] == col for a in self.meta.schema_adds)
        ):
            raise ValueError(f"column {col!r} already exists")
        self._guard_delete_predicate_capture(col)
        if agg is not None:
            agg = agg.upper()
            if agg not in AGG_TYPES:
                raise ValueError(f"unknown aggregate type {agg!r}")
            if self.meta.keys_type != "AGGREGATE":
                raise ValueError("agg only applies to AGGREGATE keys_type")
            self.meta.agg_spec[col] = agg
        entry = {"col": col, "type": col_type, "default": default}
        if col in self.meta.schema_drops:
            # Re-adding a dropped name creates a NEW column (Doris drop +
            # add): rowsets written before this point may still physically
            # store the OLD column — their values must not resurrect, so
            # the add records the first version that may carry real data
            # and reads surface the default for anything older.
            self.meta.schema_drops.remove(col)
            entry["since"] = self._next_version
        self.meta.schema_adds.append(entry)
        self._save_meta()

    def drop_column(self, col: str) -> None:
        """Doris light schema change (ALTER TABLE DROP COLUMN): metadata
        only — the column disappears from the read view; no rowset is
        rewritten (storage reclaims at the next compaction). Key,
        sequence, and partition columns cannot be dropped (Doris rule)."""
        if col in self.meta.key_cols:
            raise ValueError(f"cannot drop key column {col!r}")
        if col == self.meta.sequence_col:
            raise ValueError(f"cannot drop sequence column {col!r}")
        if self.meta.auto_partition and col == self.meta.auto_partition["col"]:
            raise ValueError(f"cannot drop partition column {col!r}")
        if (
            self.meta.range_partitions
            and col == self.meta.range_partitions["col"]
        ):
            raise ValueError(f"cannot drop partition column {col!r}")
        if col in self.meta.partition_by:
            raise ValueError(f"cannot drop partition column {col!r}")
        if col in self.meta.dist_cols:
            raise ValueError(f"cannot drop distribution column {col!r}")
        self.meta.agg_spec.pop(col, None)
        self.meta.schema_adds = [
            a for a in self.meta.schema_adds if a["col"] != col
        ]
        self.meta.value_cols = [c for c in self.meta.value_cols if c != col]
        self.meta.schema_drops.append(col)
        self._save_meta()

    def rename_column(self, old: str, new: str) -> None:
        """Doris light schema change (ALTER TABLE RENAME COLUMN):
        metadata-only mapping applied per rowset at read; every
        referencing structure (keys, agg spec, sequence/partition
        columns, pending adds) tracks the new name. Later inserts must
        use the new name."""
        if old in self.meta.schema_drops:
            raise ValueError(f"column {old!r} is dropped")
        if new in self.meta.schema_drops:
            # the read-time drop filter is name-based: renaming onto a
            # dropped name would silently erase the renamed column's data
            raise ValueError(
                f"cannot rename to dropped column name {new!r}; "
                "ADD COLUMN it back first"
            )
        self._guard_delete_predicate_capture(new)
        # "until" makes the mapping version-aware: only rowsets written
        # BEFORE the rename store the old name. A later ADD COLUMN may
        # legitimately reuse it — without the boundary, the mapping would
        # fire on new rowsets carrying the reused name and collide with
        # the renamed column (duplicate-column read failure).
        self.meta.schema_renames.append(
            {"from": old, "to": new, "until": self._next_version}
        )
        self.meta.key_cols = [new if c == old else c for c in self.meta.key_cols]
        if old in self.meta.agg_spec:
            self.meta.agg_spec[new] = self.meta.agg_spec.pop(old)
        if self.meta.sequence_col == old:
            self.meta.sequence_col = new
        self.meta.partition_by = [
            new if c == old else c for c in self.meta.partition_by
        ]
        self.meta.dist_cols = [
            new if c == old else c for c in self.meta.dist_cols
        ]
        self.meta.value_cols = [
            new if c == old else c for c in self.meta.value_cols
        ]
        if self.meta.auto_partition and self.meta.auto_partition["col"] == old:
            self.meta.auto_partition["col"] = new
        if (
            self.meta.range_partitions
            and self.meta.range_partitions["col"] == old
        ):
            self.meta.range_partitions["col"] = new
        for a in self.meta.schema_adds:
            if a["col"] == old:
                a["col"] = new
        self._save_meta()

    def modify_column_type(self, col: str, new_type: str) -> None:
        """Doris light schema change (ALTER TABLE MODIFY COLUMN ...
        TYPE): metadata-only — every rowset is cast to the new type at
        read (Doris allows compatible widenings the same way; narrowing
        casts that cannot represent stored values surface NULLs, as in
        MySQL-lax casting, so widen, don't narrow)."""
        if col in self.meta.schema_drops:
            raise ValueError(f"column {col!r} is dropped")
        if col in self.meta.key_cols:
            # a lax narrowing cast turns unrepresentable keys into NULL,
            # silently merging distinct rows — Doris likewise excludes
            # key columns from light type change (full rebuild required)
            raise ValueError(f"cannot retype key column {col!r}")
        if col == self.meta.sequence_col:
            raise ValueError(f"cannot retype sequence column {col!r}")
        if (
            col in self.meta.partition_by
            or col in self.meta.dist_cols
            or (
                self.meta.auto_partition
                and col == self.meta.auto_partition["col"]
            )
            or (
                self.meta.range_partitions
                and col == self.meta.range_partitions["col"]
            )
        ):
            # partition labels / bucket assignment were derived from the
            # stored type at write time — a read-time cast would desync
            # pruning and bucketing from storage
            raise ValueError(f"cannot retype partition/distribution column {col!r}")
        self.meta.schema_retypes[col] = new_type
        for a in self.meta.schema_adds:
            if a["col"] == col:
                a["type"] = new_type
        self._save_meta()

    def add_partition(
        self, name: str, upper: str | None = None,
        values: list[str] | None = None,
    ) -> None:
        """Doris ``ALTER TABLE t ADD PARTITION p VALUES LESS THAN
        (lit | MAXVALUE)`` on a static range-partitioned table (appends
        above the current top bound), or ``... VALUES IN (...)`` on a
        static list-partitioned one. Metadata-only."""
        rp = self.meta.range_partitions
        if rp is None:
            raise ValueError("ADD PARTITION requires a range-partitioned table")
        if any(p["name"] == name for p in rp["parts"]):
            raise ValueError(f"partition {name!r} already exists")
        if rp.get("kind") == "list":
            if values is None:
                raise ValueError(
                    "a LIST-partitioned table needs VALUES IN (...)"
                )
            declared = {v for p in rp["parts"] for v in p["values"]}
            dup = [v for v in values if v in declared]
            if dup:
                raise ValueError(f"values already declared: {dup}")
            rp["parts"].append({"name": name, "values": list(values)})
            self._save_meta()
            return
        if upper is None and values is not None:
            raise ValueError(
                "a RANGE-partitioned table needs VALUES LESS THAN (...)"
            )
        last = rp["parts"][-1] if rp["parts"] else None
        if last is not None and last["upper"] is None:
            raise ValueError(
                "cannot add above a MAXVALUE partition (it is unbounded)"
            )
        if upper is not None and last is not None:
            lk, uk = _rp_key(last["upper"]), _rp_key(upper)
            if lk[0] != uk[0] or uk <= lk:
                raise ValueError(
                    f"new upper bound {upper!r} must exceed the current "
                    f"top bound {last['upper']!r}"
                )
        rp["parts"].append(
            {"name": name, "upper": upper,
             "lower": last["upper"] if last is not None else None}
        )
        self._save_meta()

    def add_temp_partition(
        self, name: str, upper: str | None = None,
        values: list[str] | None = None,
    ) -> None:
        """Doris ``ALTER TABLE t ADD TEMPORARY PARTITION tp VALUES ...``
        ([docs: temporary-partition]): a staging partition invisible to
        reads. Strict matching (the Doris default): the declared bounds
        / value set must EQUAL one formal partition's — that is the
        partition REPLACE may later swap. Keeps the swap sound: every
        staged row provably belongs to the interval it will serve."""
        rp = self.meta.range_partitions
        if rp is None:
            raise ValueError(
                "temporary partitions require a static-partitioned table"
            )
        temps = rp.setdefault("temp", [])
        taken = {p["name"] for p in rp["parts"]} | {
            p["name"] for p in temps
        }
        if name in taken:
            raise ValueError(f"partition name {name!r} already taken")
        if rp.get("kind") == "list":
            if values is None:
                raise ValueError("LIST table: use VALUES IN (...)")
            match = [
                p for p in rp["parts"]
                if sorted(_rp_key(v) for v in p["values"])
                == sorted(_rp_key(v) for v in values)
            ]
            if not match:
                raise ValueError(
                    "strict matching: the temporary partition's value set "
                    "must equal one formal partition's"
                )
            temps.append(
                {"name": name, "for": match[0]["name"], "values": list(values)}
            )
        else:
            if upper is None:
                raise ValueError(
                    "RANGE table: use VALUES LESS THAN ('lit') — a "
                    "temporary partition for the MAXVALUE partition is "
                    "not supported (strict matching needs a finite bound)"
                )
            match = [
                p for p in rp["parts"]
                if p["upper"] is not None
                and _rp_key(p["upper"]) == _rp_key(upper)
            ]
            if not match:
                raise ValueError(
                    "strict matching: the temporary partition's upper bound "
                    "must equal one formal partition's"
                )
            temps.append(
                {"name": name, "for": match[0]["name"],
                 "upper": match[0]["upper"], "lower": match[0].get("lower")}
            )
        self._save_meta()

    def replace_partition(self, formal: str, temp: str) -> None:
        """Doris ``ALTER TABLE t REPLACE PARTITION (p) WITH TEMPORARY
        PARTITION (tp)``: the staged rows atomically take the formal
        partition's place — the backfill primitive (rebuild a day under
        a temp label while the old day keeps serving, then one metadata
        swap). The swap is a per-rowset directory rename; the formal
        name and bounds survive (upstream default
        ``use_temp_partition_name=false``)."""
        rp = self.meta.range_partitions
        if rp is None:
            raise ValueError("requires a static-partitioned table")
        tp = next(
            (p for p in rp.get("temp", []) if p["name"] == temp), None
        )
        if tp is None:
            raise ValueError(f"unknown temporary partition {temp!r}")
        if tp["for"] != formal:
            raise ValueError(
                f"strict matching: {temp!r} was declared for partition "
                f"{tp['for']!r}, not {formal!r}"
            )
        for r in self.meta.rowsets:
            fdir = os.path.join(r["path"], f"{AUTO_PART_COL}={formal}")
            tdir = os.path.join(r["path"], f"{AUTO_PART_COL}={temp}")
            if os.path.isdir(fdir):
                shutil.rmtree(fdir, ignore_errors=True)
            if os.path.isdir(tdir):
                os.rename(tdir, fdir)
            if "partitions" in r:
                r["partitions"] = sorted(
                    {formal if lbl == temp else lbl
                     for lbl in r["partitions"] if lbl != formal}
                )
        rp["temp"] = [p for p in rp["temp"] if p["name"] != temp]
        self.meta.storage_epoch += 1  # dirs under live rowsets replaced
        self._save_meta()

    def drop_partition(self, label: str) -> bool:
        """Doris DROP PARTITION: remove one auto-partition's directories
        from every rowset — O(partition size) disk reclaim, zero rewrite
        of surviving data (the whole point of time-partitioned retention
        at 100 TB: expiring a day is a directory delete, not a query).
        Returns whether anything was removed."""
        if not self.meta.auto_partition and not self.meta.range_partitions:
            raise ValueError(
                "drop_partition requires a partitioned table"
            )
        rp = self.meta.range_partitions
        if rp is not None:
            if any(p["name"] == label for p in rp.get("temp", [])):
                # dropping a staged TEMPORARY partition discards it
                rp["temp"] = [
                    p for p in rp["temp"] if p["name"] != label
                ]
            elif any(p["name"] == label for p in rp["parts"]):
                # the DECLARATION goes too (Doris: rows for a dropped
                # range have no partition — later loads in that range
                # fail rather than silently resurrecting it)
                rp["parts"] = [p for p in rp["parts"] if p["name"] != label]
            else:
                raise ValueError(f"unknown partition {label!r}")
            self._save_meta()
        return self._purge_label(label)

    def _purge_label(self, label: str) -> bool:
        """Remove one partition label's directories from every rowset
        (the disk half of DROP/TRUNCATE PARTITION), then prune fully-
        expired rowsets and recompute the delete-sign flag."""
        removed = False
        for r in self.meta.rowsets:
            p = os.path.join(r["path"], f"{AUTO_PART_COL}={label}")
            if os.path.isdir(p):
                shutil.rmtree(p, ignore_errors=True)
                removed = True
            if "partitions" in r and label in r["partitions"]:
                r["partitions"] = [x for x in r["partitions"] if x != label]
        if removed:
            # prune rowsets whose every partition expired (their meta
            # entry only costs a skipped scan, but a stranded "sign"
            # flag would keep refusing partial-column loads forever),
            # then recompute has_delete_sign from the survivors
            live, dead = [], []
            for r in self.meta.rowsets:
                (live if self._labels_of(r["path"]) else dead).append(r)
            if dead:
                # pin the high-water mark before dropping the entries it
                # is derived from — versions must stay monotonic
                self.meta.last_version = max(
                    self.meta.last_version, self._next_version - 1
                )
            self.meta.rowsets = live
            for r in dead:
                shutil.rmtree(r["path"], ignore_errors=True)
            # recompute only when every survivor carries explicit sign
            # metadata: a rowset persisted before the per-rowset 'sign'
            # flag existed may hold sign rows, and clearing the table
            # flag on its behalf would stop the read path filtering
            # delete-sign rows (batch-deleted keys would resurface)
            if all("sign" in r for r in self.meta.rowsets):
                self.meta.has_delete_sign = any(
                    r["sign"] for r in self.meta.rowsets
                )
            self.meta.storage_epoch += 1  # label dirs deleted in place
            self._save_meta()  # bump the mutation token
        return removed

    def _apply_retention(self) -> None:
        keep = self.meta.dynamic_partition_retention
        if not keep:
            return
        labels = self.partitions()
        for lbl in labels[:-keep] if len(labels) > keep else []:
            self.drop_partition(lbl)

    def compact(self) -> None:
        """Materialize the merge-on-read view into a single rowset
        (Doris base compaction: applies model merge semantics AND any
        pending delete predicates eagerly, then clears them). On an
        empty table (truncated, or every partition expired) compaction
        is a no-op, not an error. Emptiness is probed via _raw() — NOT by
        catching read()'s ValueError, which would also swallow genuine
        read-path errors (e.g. a malformed stored delete predicate) and
        turn compaction into a silent no-op."""
        if (self.meta.range_partitions or {}).get("temp"):
            # compaction materializes read() — which EXCLUDES staged
            # temporary-partition rows, so compacting now would silently
            # discard them
            raise ValueError(
                "cannot compact with live temporary partitions — "
                "REPLACE or drop them first"
            )
        if self._raw() is None:
            return
        self._replace_storage(self.read())

    def partition_label_expr(self, temp_partition: str | None = None):
        """STATIC-partition routing expression: each row maps to the
        FIRST declared partition whose interval / value set matches;
        no match → the ``__no_part__`` sentinel (checked after the
        write so a bad load fails atomically — Doris rejects loads
        with partition-less rows). A TEMPORARY-partition load routes
        against that temp's interval ONLY."""
        rp = self.meta.range_partitions
        route_parts = (
            [p for p in rp.get("temp", []) if p["name"] == temp_partition]
            if temp_partition is not None
            else rp["parts"]
        )
        label_expr = F.lit("__no_part__")
        for p in reversed(route_parts):
            if rp.get("kind") == "list":
                cond = F.expr(
                    f"`{rp['col']}` IN (" + ", ".join(p["values"]) + ")"
                )
            else:
                conds = []
                if p.get("lower") is not None:
                    conds.append(f"`{rp['col']}` >= {p['lower']}")
                if p["upper"] is not None:
                    conds.append(f"`{rp['col']}` < {p['upper']}")
                cond = F.expr(" AND ".join(conds)) if conds else F.lit(True)
            label_expr = F.when(cond, F.lit(p["name"])).otherwise(label_expr)
        return label_expr

    def truncate_partition(self, label: str) -> bool:
        """Doris ``TRUNCATE TABLE t PARTITION (p)``: empty ONE
        partition's storage. Unlike DROP PARTITION the DECLARATION
        survives, so later loads in the range still route there."""
        if not self.meta.auto_partition and not self.meta.range_partitions:
            raise ValueError("truncate_partition requires a partitioned table")
        rp = self.meta.range_partitions
        if rp is not None and not any(
            p["name"] == label for p in rp["parts"]
        ):
            raise ValueError(f"unknown partition {label!r}")
        return self._purge_label(label)

    def _label_salted_exprs(self, df: DataFrame, parts: list[str]):
        """Partition exprs for the pre-write shuffle, with an OPTIONAL
        within-label salt for pathologically hot labels (VERDICT r12
        what's-wrong #3, guide §2.4/§6).

        Hash-distributing by label alone (the write.distribution-mode=
        hash posture) serializes each label into one writer task — the
        right default (files-per-load = #labels), but a label holding
        half the load becomes a straggler writing one giant file. When
        ``palo_spark.write.hotLabelRowThreshold`` is set > 0, one
        bounded aggregation (≤ #labels rows collected) finds labels
        whose row count exceeds the threshold and spreads EACH over
        ``ceil(rows/threshold)`` salt buckets, so a hot label writes in
        parallel with files-per-label still bounded by that k. Cold
        labels keep k=1 — ``pmod(hash, 1) == 0`` — bit-identical
        placement to the unsalted form.

        Default OFF (threshold 0): the bench and every local workload
        keep the one-file-per-label layout with no extra pass; a 100 TB
        deployment sets the threshold to its target rows-per-file (e.g.
        rows yielding ~1 GiB) where the extra count pass is noise next
        to a skewed write. Salt input is the hash of the non-partition
        columns — deterministic under task retry, unlike a
        monotonically_increasing_id.

        Returns ``(num_partitions | None, exprs)``: when salting, the
        shuffle gets an EXPLICIT partition count equal to the number of
        distinct (label, salt) groups — an explicit count is exempt
        from AQE coalescing, which would otherwise merge the small salt
        buckets right back into one task (observed at fixture scale);
        the count derives from the observed label histogram, never from
        the local core count."""
        exprs = [F.col(c) for c in parts]
        try:
            threshold = int(
                df.sparkSession.conf.get(HOT_LABEL_THRESHOLD_CONF, "0")
            )
        except ValueError:
            threshold = 0
        if threshold <= 0:
            return None, exprs
        data_cols = [c for c in df.columns if c not in parts]
        if not data_cols:
            return None, exprs
        counts = df.groupBy(*exprs).count().collect()
        hot: dict[tuple, int] = {}
        for row in counts:
            n = row["count"]
            if n > threshold:
                hot[tuple(row[c] for c in parts)] = -(-n // threshold)
        if not hot:
            return None, exprs
        k_expr = F.lit(1)
        for key, k in hot.items():
            cond = None
            for c, v in zip(parts, key):
                this = F.col(c).eqNullSafe(F.lit(v))
                cond = this if cond is None else (cond & this)
            k_expr = F.when(cond, F.lit(k)).otherwise(k_expr)
        salt = F.pmod(F.hash(*[F.col(c) for c in data_cols]), k_expr)
        groups = len(counts) - len(hot) + sum(hot.values())
        return groups, exprs + [salt]

    def _write_rowset(
        self, df: DataFrame, path: str, temp_partition: str | None = None
    ) -> None:
        """One rowset write. AUTO PARTITION tables derive the partition
        label from the partition column (implicit partition creation at
        load — Doris 2.1 auto-partition) and lay the rowset out as hive
        partitions, so label predicates prune directories natively."""
        if self.meta.buckets and self.meta.dist_cols:
            df = df.repartition(
                self.meta.buckets, *[F.col(c) for c in self.meta.dist_cols]
            )
        ap = self.meta.auto_partition
        rp = self.meta.range_partitions
        parts = list(self.meta.partition_by)
        if rp is not None:
            if AUTO_PART_COL not in df.columns:
                df = df.withColumn(
                    AUTO_PART_COL, self.partition_label_expr(temp_partition)
                )
            parts = [AUTO_PART_COL] + parts
        if ap is not None:
            if AUTO_PART_COL not in df.columns:
                # label = granularity letter + formatted bucket, e.g.
                # "d2024-01-15" / "m2024-01" / "y2024": the prefix keeps
                # hive partition-value type inference from reading labels
                # back as DATE/INT (which would break string-range
                # directory pruning); lexicographic time order within a
                # table is preserved since the prefix is constant.
                # LIST partitioning labels with the raw value ("l" +
                # value string — one partition per distinct value).
                bucket = (
                    F.col(ap["col"]).cast("string")
                    if ap["granularity"] == "list"
                    else F.date_format(
                        F.col(ap["col"]).cast("timestamp"),
                        AUTO_PART_FMT[ap["granularity"]],
                    )
                )
                df = df.withColumn(
                    AUTO_PART_COL,
                    F.concat(F.lit(ap["granularity"][0]), bucket),
                )
            parts = [AUTO_PART_COL] + parts
        if parts and not (self.meta.buckets and self.meta.dist_cols):
            # partitioned, unbucketed write: hash-distribute rows by the
            # partition label(s) before the partitionBy write (the
            # write.distribution-mode=hash posture, guide §6). Without
            # this, every input task writes one small file into EVERY
            # label directory it touches — a single-task 150k-row load
            # into 80 month labels spent ~2 s opening 80 sequential
            # parquet writers (measured r12); and a W-task load would
            # write W×L files. With it, each label lands in exactly one
            # task: files-per-load = #labels, written in parallel.
            # Bucketed tables keep their dist-col layout (above) — the
            # bucket repartition already bounds file counts per load.
            # Tie note (ADVICE r12): this shuffle discards insertion
            # order within a load, so for UNIQUE tables WITHOUT a
            # sequence column, which duplicate-key row within ONE load
            # survives the merge is UNSPECIFIED (placement-dependent)
            # rather than file-order-stable. Doris itself documents the
            # no-sequence-col tie as undefined under concurrent import;
            # callers that care declare a sequence column (the supported
            # Doris mechanism, exercised by table_model_unique_sequence).
            n_salt, exprs = self._label_salted_exprs(df, parts)
            df = (
                df.repartition(*exprs)
                if n_salt is None
                else df.repartition(n_salt, *exprs)
            )
        writer = df.write.mode("overwrite")
        if parts:
            writer = writer.partitionBy(*parts)
        writer.parquet(path)
        if rp is not None and "__no_part__" in self._labels_of(path):
            shutil.rmtree(path, ignore_errors=True)
            raise ValueError(
                "load has rows with no matching partition (value not "
                "declared, beyond the last upper bound, or inside a "
                "dropped partition's hole) — ADD PARTITION first"
            )

    def _replace_storage(self, df: DataFrame) -> None:
        version = self._next_version
        path = os.path.join(self.location, f"rowset_v{version}_{uuid.uuid4().hex[:8]}")
        self._write_rowset(df, path)
        old_paths = [r["path"] for r in self.meta.rowsets]
        self.meta.rowsets = [
            {
                "version": version,
                "path": path,
                "label": None,
                "partitions": self._labels_of(path),
            }
        ]
        self.meta.deletes = []  # folded into the rewritten rowset
        # read() already dropped sign-deleted keys and the hidden column —
        # the folded rowset is sign-free
        self.meta.has_delete_sign = False
        self.meta.storage_epoch += 1  # prior rowset dirs removed below
        self._save_meta()
        for p in old_paths:
            shutil.rmtree(p, ignore_errors=True)

    def _check_partial_schema(self, df: DataFrame) -> list[str]:
        """Validate a partial-column batch; returns its value columns.

        Doris restricts partial update to the UNIQUE merge-on-write
        model; the analogous restrictions here keep the column-wise merge
        well-defined: no partitioned layout (a partial row may not carry
        the partition column at all). A table WITH a sequence column
        accepts partial batches since r9 (upstream 2.0 supports the
        combination) — the batch must then carry the sequence column,
        which becomes the batch's per-column win priority (see read()).
        """
        if self.meta.keys_type != "UNIQUE":
            raise ValueError(
                "partial_columns requires the UNIQUE key model (Doris "
                f"partial update restriction); table is {self.meta.keys_type}"
            )
        if self.meta.partition_by or self.meta.auto_partition:
            raise ValueError(
                "partial_columns is not supported on partitioned tables"
            )
        cols = list(df.columns)
        missing = [c for c in self.meta.key_cols if c not in cols]
        if missing:
            raise ValueError(f"partial batch missing key columns: {missing}")
        seq = self.meta.sequence_col
        if seq and seq not in cols:
            raise ValueError(
                f"partial batch must carry the sequence column {seq!r} — "
                "it is the batch's win priority against columns it "
                "updates (Doris 2.0 partial update + sequence_col)"
            )
        value_cols = [c for c in cols if c not in self.meta.key_cols and c != seq]
        if not value_cols:
            raise ValueError("partial batch carries no value columns")
        dropped = set(self.meta.schema_drops)
        bad = [c for c in value_cols if c in dropped]
        if bad:
            raise ValueError(f"partial batch writes dropped columns: {bad}")
        if self.meta.value_cols:
            allowed = set(self.meta.value_cols) | {
                a["col"] for a in self.meta.schema_adds
            }
            unknown = sorted(c for c in value_cols if c not in allowed)
            if unknown:
                raise ValueError(
                    f"partial batch carries unknown columns: {unknown}"
                )
        # the sequence column rides every load, so it is always "carried"
        # — the per-column argmax then merges it like any carried column
        # (the output sequence is the max (seq, version) one, the value
        # Doris's merge-on-write would store)
        return sorted(value_cols + ([seq] if seq else []))

    def _check_schema(self, df: DataFrame) -> None:
        cols = set(df.columns)
        missing = [c for c in self.meta.key_cols if c not in cols]
        if missing:
            raise ValueError(f"insert batch missing key columns: {missing}")
        if self.meta.sequence_col and self.meta.sequence_col not in cols:
            raise ValueError(f"insert batch missing sequence column {self.meta.sequence_col!r}")
        added = {a["col"] for a in self.meta.schema_adds}  # optional in loads
        for c in self.meta.agg_spec:
            if c not in cols and c not in added:
                raise ValueError(f"insert batch missing value column {c!r}")
        if self.meta.value_cols:
            # a rowset missing a declared value column poisons every
            # later read at the union — reject the LOAD instead; unknown
            # columns are equally rejected (they would silently appear
            # in the read view)
            missing_v = [c for c in self.meta.value_cols if c not in cols]
            if missing_v:
                raise ValueError(
                    f"insert batch missing value columns: {missing_v}"
                )
            allowed = (
                set(self.meta.value_cols)
                | added
                | set(self.meta.key_cols)
                | {self.meta.sequence_col, DELETE_SIGN_COL, AUTO_PART_COL}
            )
            unknown = sorted(c for c in cols if c not in allowed)
            if unknown:
                raise ValueError(
                    f"insert batch carries unknown columns: {unknown}"
                )

    # --------------------------------------------------------------- reads

    def _labels_of(self, rowset_path: str) -> list[str]:
        if not self.meta.auto_partition and not self.meta.range_partitions:
            return []
        try:
            names = os.listdir(rowset_path)
        except FileNotFoundError:
            return []
        return sorted(
            nm.split("=", 1)[1]
            for nm in names
            if nm.startswith(f"{AUTO_PART_COL}=")
        )

    def partition_versions(self) -> dict[str, int]:
        """Per-partition version map (Doris partition visible versions):
        a partition's version is the highest table version that touched
        it — a new rowset writing into the partition, or any DELETE
        (conservatively counted against every partition; the predicate
        may match anywhere). Schema changes are table-wide and tracked
        separately by :meth:`state_token`. The basis for partition-level
        cache invalidation and incremental MV refresh."""
        if not self.meta.auto_partition and not self.meta.range_partitions:
            raise ValueError("partition_versions requires a partitioned table")
        delete_v = max((d["version"] for d in self.meta.deletes), default=0)
        out: dict[str, int] = {}
        for r in self.meta.rowsets:
            labels = r.get("partitions")
            if labels is None:  # legacy rowset meta: derive on demand
                labels = self._labels_of(r["path"])
            for lbl in labels:
                out[lbl] = max(out.get(lbl, 0), r["version"], delete_v)
        live = set(self.partitions())  # dropped partitions disappear
        return {k: v for k, v in out.items() if k in live}

    def partitions(self) -> list[str]:
        """Live auto-partition labels (Doris SHOW PARTITIONS analog),
        from rowset directory listings — metadata-only, no data scan."""
        labels: set[str] = set()
        for r in self.meta.rowsets:
            try:
                names = os.listdir(r["path"])
            except FileNotFoundError:
                continue
            for nm in names:
                if nm.startswith(f"{AUTO_PART_COL}="):
                    labels.add(nm.split("=", 1)[1])
        return sorted(labels)

    def _prune_predicate(self, where: str | None):
        """Doris-FE-style partition pruning: map simple range/equality
        conjuncts on the partition column to partition-LABEL bounds
        (labels sort lexicographically in time order). Conservative and
        fail-open — anything with OR / parentheses / non-literal
        comparisons just skips pruning; row-level filtering still
        applies the full predicate afterwards, so pruning can only
        remove partitions that cannot match."""
        import re
        from datetime import datetime

        rp = self.meta.range_partitions
        if rp is not None and where:
            return self._prune_range_parts(where)
        ap = self.meta.auto_partition
        if not ap or not where:
            return None
        if re.search(r"(?i)\bor\b", where) or "(" in where:
            return None
        prefix = ap["granularity"][0]
        if ap["granularity"] == "list":
            # list labels are raw value strings: only EQUALITY conjuncts
            # prune soundly (lexicographic ranges over arbitrary values
            # would reorder numerics) — everything else fails open
            col = re.escape(ap["col"])
            conds = []
            for conj in re.split(r"(?i)\s+and\s+", where.strip()):
                m = re.fullmatch(
                    rf"\s*{col}\s*=\s*(?:'([^']+)'|(-?\d+))\s*",
                    conj, re.IGNORECASE,
                )
                if m:
                    lit = m.group(1) if m.group(1) is not None else m.group(2)
                    conds.append(F.col(AUTO_PART_COL) == prefix + lit)
            if not conds:
                return None
            out = conds[0]
            for c in conds[1:]:
                out = out & c
            return out
        strp = {"hour": "%Y-%m-%d-%H", "day": "%Y-%m-%d",
                "month": "%Y-%m", "year": "%Y"}[ap["granularity"]]

        def label(lit: str) -> str | None:
            for p in ("%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S",
                      "%Y-%m-%d %H:%M", "%Y-%m-%d"):
                try:
                    return prefix + datetime.strptime(lit, p).strftime(strp)
                except ValueError:
                    pass
            return None

        col = re.escape(ap["col"])
        lit_re = r"(?:date\s+|timestamp\s+)?'([^']+)'"
        conds = []
        # pull BETWEEN clauses out first — their inner AND must not be
        # treated as a conjunction boundary
        def _between(m):
            lo, hi = label(m.group(1)), label(m.group(2))
            if lo is not None:
                conds.append(F.col(AUTO_PART_COL) >= lo)
            if hi is not None:
                conds.append(F.col(AUTO_PART_COL) <= hi)
            return "TRUE"

        where = re.sub(
            rf"{col}\s+between\s+{lit_re}\s+and\s+{lit_re}",
            _between,
            where,
            flags=re.IGNORECASE,
        )
        for conj in re.split(r"(?i)\s+and\s+", where.strip()):
            m = re.fullmatch(
                rf"\s*{col}\s*(>=|<=|=|<|>)\s*{lit_re}\s*", conj, re.IGNORECASE
            )
            if m:
                op, lbl = m.group(1), label(m.group(2))
                if lbl is None:
                    continue
                c = F.col(AUTO_PART_COL)
                # value-level bounds widen to label-level bounds: e.g.
                # ts < X keeps X's own partition (rows at X's label but
                # below X row-filter away afterwards)
                conds.append(
                    c >= lbl if op in (">", ">=")
                    else c <= lbl if op in ("<", "<=")
                    else c == lbl
                )
        if not conds:
            return None
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return out

    def _prune_range_parts(self, where: str):
        """Static-range-partition pruning: map simple conjuncts on the
        partition column to the set of DECLARED partitions whose
        [lower, upper) interval can match, widened at boundaries.
        Conservative and fail-open (same contract as the auto path):
        OR / parentheses / kind-mismatched literals skip pruning."""
        import re

        rp = self.meta.range_partitions
        if re.search(r"(?i)\bor\b", where) or "(" in where:
            return None
        col = re.escape(rp["col"])
        if rp.get("kind") == "list":
            # static LIST: only equality conjuncts prune — the matching
            # partition is the one DECLARING the value (none → empty set,
            # which is itself a sound prune: the value cannot exist)
            allowed_l: set[str] | None = None
            for conj in re.split(r"(?i)\s+and\s+", where.strip()):
                m = re.fullmatch(
                    rf"\s*{col}\s*=\s*('[^']*'|-?\d+(?:\.\d+)?)\s*",
                    conj, re.IGNORECASE,
                )
                if not m:
                    continue
                want = _rp_key(m.group(1))
                keep = {
                    p["name"]
                    for p in rp["parts"]
                    if any(_rp_key(v) == want for v in p["values"])
                }
                allowed_l = keep if allowed_l is None else (allowed_l & keep)
            if allowed_l is None or allowed_l == {
                p["name"] for p in rp["parts"]
            }:
                return None
            return F.col(AUTO_PART_COL).isin(sorted(allowed_l))
        bounds = [
            (p["name"],
             _rp_key(p["lower"]) if p.get("lower") is not None else None,
             _rp_key(p["upper"]) if p["upper"] is not None else None)
            for p in rp["parts"]
        ]
        allowed: set[str] | None = None
        for conj in re.split(r"(?i)\s+and\s+", where.strip()):
            m = re.fullmatch(
                rf"\s*{col}\s*(>=|<=|=|<|>)\s*"
                r"(?:date\s+|timestamp\s+)?('[^']+'|-?\d+(?:\.\d+)?)\s*",
                conj, re.IGNORECASE,
            )
            if not m:
                continue
            op, x = m.group(1), _rp_key(m.group(2))
            keep = set()
            mismatch = False
            for name, lo, up in bounds:
                if (lo is not None and lo[0] != x[0]) or (
                    up is not None and up[0] != x[0]
                ):
                    mismatch = True
                    break
                # widened interval logic: a boundary partition is KEPT
                # (row-level filtering finishes the job afterwards)
                if op in ("<", "<="):
                    ok = lo is None or lo <= x
                elif op in (">", ">="):
                    ok = up is None or up > x
                else:  # '='
                    ok = (lo is None or lo <= x) and (up is None or x < up)
                if ok:
                    keep.add(name)
            if mismatch:
                return None
            allowed = keep if allowed is None else (allowed & keep)
        if allowed is None or allowed == {p["name"] for p in rp["parts"]}:
            return None
        return F.col(AUTO_PART_COL).isin(sorted(allowed))

    def scan(self, where: str | None = None) -> DataFrame:
        """Read the merge view with Doris-style partition pruning: on an
        AUTO PARTITION table, range/equality predicates on the partition
        column select partition directories BEFORE the merge window runs
        (sound because the partition column is a key column on keyed
        models — all versions of a logical row share one partition).
        The full ``where`` still applies row-level afterwards."""
        df = self.read(partition_pred=self._prune_predicate(where))
        if where:
            df = df.filter(F.expr(where))
        return df

    def _rowset_frame(self, path: str) -> DataFrame:
        """``spark.read.parquet(path)`` through _ROWSET_CACHE: one
        schema-inference round-trip per (session, rowset, storage
        epoch) instead of one per read. Failures are never cached —
        the caller's AnalysisException handling (fully-expired rowset)
        stays on the uncached path."""
        key = id(self.spark)
        slot = _ROWSET_CACHE.get(key)
        if slot is None:
            _ROWSET_CACHE.clear()  # old session's frames are dead handles
            slot = _ROWSET_CACHE.setdefault(key, (self.spark, {}))
        tables = slot[1]
        token = (self.meta.lineage, self.meta.storage_epoch)
        entry = tables.get(self.location)
        if entry is None or (entry[0], entry[1]) != token:
            entry = (*token, {})
            tables[self.location] = entry
        frames = entry[2]
        df = frames.get(path)
        if df is None:
            df = self.spark.read.parquet(path)
            frames[path] = df
        return df

    def _raw(self, partition_pred=None) -> DataFrame | None:
        """Union of all rowsets with the version column attached.

        Added columns (light schema change) are normalized per rowset
        BEFORE the union: a rowset without the column gets the declared
        default, one with it keeps its stored values (explicit NULLs
        survive) — old rowsets never need rewriting."""
        from pyspark.errors import AnalysisException

        dfs = []
        metas = []  # rowset dicts parallel to dfs (skipped rowsets excluded)
        for r in sorted(self.meta.rowsets, key=lambda r: r["version"]):
            try:
                d = self._rowset_frame(r["path"])
            except AnalysisException:
                # every partition of this rowset expired via
                # drop_partition/retention — nothing left to read
                continue
            if partition_pred is not None and AUTO_PART_COL in d.columns:
                d = d.filter(partition_pred)
            d = d.withColumn(_VERSION_COL, F.lit(r["version"]).cast("long"))
            # renames first (schema_adds/key_cols/agg_spec already track
            # the new names), then add-normalization, then drops; only
            # rowsets OLDER than the rename store the old name (entries
            # without "until" predate the boundary and apply to all)
            for rn in self.meta.schema_renames:
                before = (
                    "until" not in rn or r["version"] < rn["until"]
                )
                if before and rn["from"] in d.columns:
                    d = d.withColumnRenamed(rn["from"], rn["to"])
            for a in self.meta.schema_adds:
                # "since" marks a drop + re-add: older rowsets may still
                # physically store the dropped incarnation — mask it
                fresh = a.get("since") is None or r["version"] >= a["since"]
                if a["col"] in d.columns and fresh:
                    d = d.withColumn(a["col"], F.col(a["col"]).cast(a["type"]))
                else:
                    d = d.withColumn(a["col"], F.lit(a["default"]).cast(a["type"]))
            if self.meta.schema_drops:
                d = d.drop(*[c for c in self.meta.schema_drops if c in d.columns])
            for rc, rt in self.meta.schema_retypes.items():
                if rc in d.columns:
                    d = d.withColumn(rc, F.col(rc).cast(rt))
            if self.meta.has_delete_sign:
                # rowsets loaded without the hidden sign are all-upsert
                d = d.withColumn(
                    DELETE_SIGN_COL,
                    (
                        F.col(DELETE_SIGN_COL).cast("int")
                        if DELETE_SIGN_COL in d.columns
                        else F.lit(0)
                    ),
                )
            dfs.append(d)
            metas.append(r)
        if not dfs:
            return None
        has_partial = any(r.get("partial") for r in self.meta.rowsets)
        if has_partial:
            # Tag each rowset with the literal list of value columns it
            # CARRIES (after schema changes), so the column-wise merge in
            # read() can tell a stored NULL (present → overwrites) from a
            # column the load never touched (absent → preserved). A
            # per-rowset constant array — zero per-row cost, folded by
            # Catalyst.
            for i, (r, d) in enumerate(zip(metas, dfs)):
                if r.get("partial"):
                    # A partial rowset carries EXACTLY the columns its
                    # load carried (recorded at insert; renames mapped at
                    # read, drops excluded). The schema-add normalization
                    # above fills added columns with their defaults for
                    # frame alignment only — the rowset must NOT claim
                    # them, or a newer partial load would overwrite a
                    # genuinely stored value with the declared default.
                    names = list(r["partial"])
                    for rn in self.meta.schema_renames:
                        if "until" in rn and r["version"] >= rn["until"]:
                            continue  # load already used the new name
                        names = [
                            rn["to"] if c == rn["from"] else c for c in names
                        ]
                    present = [
                        c for c in names if c not in self.meta.schema_drops
                    ]
                else:
                    present = [
                        c
                        for c in d.columns
                        if c not in (_VERSION_COL, _PCOLS_COL, AUTO_PART_COL)
                        and c not in self.meta.key_cols
                    ]
                dfs[i] = d.withColumn(
                    _PCOLS_COL, F.array(*[F.lit(c) for c in present])
                )
        out = dfs[0]
        for d in dfs[1:]:
            # partial rowsets lack columns by design — fill them NULL and
            # let the presence tag disambiguate
            out = out.unionByName(d, allowMissingColumns=has_partial)
        # Apply deferred delete predicates: a delete at version v removes
        # matching rows from rowsets with version < v only (later loads
        # are unaffected — Doris delete-version semantics). The filter is
        # a native per-row expression: scan-adjacent, scale-free, and for
        # partition-column predicates Catalyst prunes whole partitions.
        for d in self.meta.deletes:
            pred = F.expr(d["predicate"])
            out = out.filter(
                ~(
                    (F.col(_VERSION_COL) < F.lit(int(d["version"])))
                    & F.coalesce(pred, F.lit(False))
                )
            )
        return out

    def _sync_meta(self) -> None:
        """Converge on externally-committed state (r10 audit — the
        cross-handle contract, pinned): another handle of the same
        table directory (``Table.open``, or a second session) may have
        committed mutations through its own Table object; this handle's
        in-memory meta would serve stale rowsets AND a stale
        ``state_token`` (the result cache would then never invalidate).
        Reload the persisted meta when its mutation counter is ahead of
        ours or its lineage differs (directory recreated underneath).

        Contract: ONE writer at a time per table directory (every save
        is whole-meta, last writer wins — no meta merging); any number
        of reader handles converge at their next read()/state_token().
        Concurrent writers are unsupported, same as Doris's single-FE
        metadata ownership."""
        try:
            with open(os.path.join(self.location, _META_FILE)) as f:
                d = json.load(f)
        except (OSError, json.JSONDecodeError):
            return
        if (
            d.get("mutations", 0) > self.meta.mutations
            or d.get("lineage") != self.meta.lineage
        ):
            self.meta = TableMeta(**d)

    def read(self, partition_pred=None) -> DataFrame:
        """The merge-on-read view (what a query over this table sees).

        ``partition_pred`` (internal; see :meth:`scan`) filters auto-
        partition labels at the rowset scans, before any merge."""
        self._sync_meta()
        rp = self.meta.range_partitions
        temp_labels = [p["name"] for p in (rp or {}).get("temp", [])]
        if temp_labels:
            # staged TEMPORARY-partition rows are invisible until
            # REPLACE PARTITION swaps them in (Doris semantics)
            excl = ~F.col(AUTO_PART_COL).isin(temp_labels)
            partition_pred = (
                excl if partition_pred is None else (partition_pred & excl)
            )
        raw = self._raw(partition_pred)
        if raw is None:
            raise ValueError(f"table {self.meta.name!r} has no data")
        data_cols = [
            c
            for c in raw.columns
            if c not in (_VERSION_COL, _PCOLS_COL, DELETE_SIGN_COL)
        ]

        if self.meta.keys_type == "DUPLICATE":
            return raw.select(*data_cols)

        if self.meta.keys_type == "UNIQUE":
            if _PCOLS_COL in raw.columns:
                # Partial-column updates present: latest-wins is decided
                # PER COLUMN, not per row — for each value column take the
                # value from the newest rowset that CARRIES it. One hash
                # aggregate on the key (same shuffle as the row-wise
                # path); per column an argmax over (carried ? version :
                # -1, value), so an explicit NULL in a carrying load
                # overwrites while an absent column is invisible. Keys
                # only ever touched partially yield NULL for columns no
                # load carried (v stays -1) — the documented contract.
                val_cols = [c for c in data_cols if c not in self.meta.key_cols]
                seq = self.meta.sequence_col
                # MAP-typed (or map-containing) columns are un-orderable
                # in Spark, so max(struct(rank, x)) fails analysis for
                # them; those fall back to max_by(x, rank) — same winner,
                # ties among identical ranks broken arbitrarily instead
                # of by value (exactly the row-wise path's tie behavior)
                dtypes = dict(zip(raw.schema.names, raw.schema.fields))

                def _orderable(dt):
                    from pyspark.sql.types import (
                        ArrayType, MapType, StructType,
                    )

                    if isinstance(dt, MapType):
                        return False
                    if isinstance(dt, ArrayType):
                        return _orderable(dt.elementType)
                    if isinstance(dt, StructType):
                        return all(_orderable(f.dataType) for f in dt.fields)
                    return True

                def _argmax(c, rank_fields):
                    if _orderable(dtypes[c].dataType):
                        return F.max(
                            F.struct(*rank_fields, F.col(c).alias("x"))
                        )["x"].alias(c)
                    return F.max_by(
                        F.col(c), F.struct(*rank_fields)
                    ).alias(c)

                if seq:
                    # sequence column present (Doris 2.0 partial update +
                    # sequence_col): the winner per column is the argmax
                    # over (carries-it, sequence, version) — a partial
                    # load with a LOWER sequence than the live row loses
                    # every column it carries (out-of-order ingestion
                    # safety), a higher-sequence partial wins exactly its
                    # carried columns. Every load must carry the sequence
                    # column (enforced at insert), so its own merged value
                    # is the winning (seq, version) one. NULL sequences
                    # lose to non-NULL (struct ordering — same outcome as
                    # the row-wise desc-NULLS-LAST path).
                    aggs = [
                        _argmax(
                            c,
                            [
                                F.array_contains(F.col(_PCOLS_COL), F.lit(c))
                                .cast("int")
                                .alias("p"),
                                F.col(seq).alias("s"),
                                F.col(_VERSION_COL).alias("v"),
                            ],
                        )
                        for c in val_cols
                    ]
                else:
                    aggs = [
                        _argmax(
                            c,
                            [
                                F.when(
                                    F.array_contains(F.col(_PCOLS_COL), F.lit(c)),
                                    F.col(_VERSION_COL),
                                )
                                .otherwise(F.lit(-1))
                                .cast("long")
                                .alias("v"),
                            ],
                        )
                        for c in val_cols
                    ]
                return (
                    raw.groupBy(*self.meta.key_cols)
                    .agg(*aggs)
                    .select(*data_cols)
                )
            # Doris function_column.sequence_col exists to survive
            # out-of-order ingestion: the SEQUENCE VALUE decides the winner
            # across loads, with load version only as the tie-break. A later
            # insert carrying a lower sequence must NOT overwrite a
            # higher-sequence row.
            order = [F.desc(_VERSION_COL)]
            if self.meta.sequence_col:
                order = [F.desc(self.meta.sequence_col), F.desc(_VERSION_COL)]
            w = Window.partitionBy(*self.meta.key_cols).orderBy(*order)
            merged = raw.withColumn("__rn", F.row_number().over(w)).filter(
                F.col("__rn") == 1
            )
            if self.meta.has_delete_sign:
                # Doris batch delete: the key disappears only if the
                # DELETING row wins the merge — a delete carrying a lower
                # sequence than the live row correctly loses and leaves
                # the key visible
                merged = merged.filter(
                    F.coalesce(F.col(DELETE_SIGN_COL), F.lit(0)) != 1
                )
            return merged.select(*data_cols)

        # AGGREGATE: pre-merge value columns per key
        aggs = []
        for c in data_cols:
            if c in self.meta.key_cols:
                continue
            a = self.meta.agg_spec.get(c, "REPLACE")
            col = F.col(c)
            if a == "SUM":
                aggs.append(F.sum(col).alias(c))
            elif a == "MIN":
                aggs.append(F.min(col).alias(c))
            elif a == "MAX":
                aggs.append(F.max(col).alias(c))
            elif a == "REPLACE":
                aggs.append(F.max_by(col, F.col(_VERSION_COL)).alias(c))
            elif a == "BITMAP_UNION":
                from palo_spark.functions import sketches as SK

                aggs.append(SK.bitmap_union_of_bitmaps(col).alias(c))
            elif a == "HLL_UNION":
                from palo_spark.functions import sketches as SK

                aggs.append(SK.hll_union_agg(col).alias(c))
            elif a == "QUANTILE_UNION":
                from palo_spark.functions import sketches as SK

                aggs.append(SK.quantile_union(col).alias(c))
            else:  # REPLACE_IF_NOT_NULL — latest version where value non-null
                aggs.append(
                    F.max_by(
                        col, F.when(col.isNotNull(), F.col(_VERSION_COL))
                    ).alias(c)
                )
        return raw.groupBy(*self.meta.key_cols).agg(*aggs).select(*data_cols)

    def register(self, view_name: str | None = None) -> str:
        """Expose the merge view to ``spark.sql`` as a temp view."""
        name = view_name or self.meta.name
        self.read().createOrReplaceTempView(name)
        return name

    def state_token(self) -> str:
        """A token that changes on EVERY mutation (loads, deletes,
        schema changes, truncate, compaction, partition drops) — the
        invalidation key for result caching (Doris's SQL cache checks
        partition versions the same way). Carries the creation-time
        lineage nonce so a DROPPED-and-RECREATED table under the same
        name can never collide with the old table's cached entries
        (r9 audit: mutations alone restarted on the new Table object
        and replayed the old table's cached count); within one table
        the mutation counter is monotonic, never reused —
        truncate+reload cannot collide with an earlier state. Syncs
        externally-committed meta first (see ``_sync_meta``) so a
        cached result can never outlive a mutation committed through
        another handle of the same directory."""
        self._sync_meta()
        return f"{self.meta.lineage}:{self.meta.mutations}"

    def truncate(self) -> None:
        """Doris TRUNCATE TABLE: drop all rowsets, deletes, and the
        label ledger (a truncated table accepts the same labels again,
        as Doris does after truncate recreates partitions); schema and
        model metadata survive."""
        # pin the high-water mark BEFORE clearing the lists it is
        # otherwise derived from — post-truncate versions stay monotonic
        self.meta.last_version = max(self.meta.last_version, self._next_version)
        for r in self.meta.rowsets:
            shutil.rmtree(r["path"], ignore_errors=True)
        self.meta.rowsets = []
        self.meta.deletes = []
        self.meta.labels = []
        # no rowsets → no live sign-carrying rowsets: a truncated table
        # must accept partial-column loads again without a manual compact
        self.meta.has_delete_sign = False
        self.meta.storage_epoch += 1  # all rowset dirs removed
        self._save_meta()

    def drop(self) -> None:
        shutil.rmtree(self.location, ignore_errors=True)
