"""Rollup / materialized-view rewrite layer (SURVEY.md §1.2, §4;
upstream ``MaterializedIndex.java`` / ``MaterializedViewSelector.java``).

Doris keeps synchronous pre-aggregated projections (ROLLUPs) of a base
table and silently answers covered queries from the cheapest one.
Catalyst has no MV selection, so this is the one genuinely custom
optimizer piece — implemented as a Python-level rewrite, not a JVM
rule (SURVEY §4 decision):

- :class:`Rollup` — a materialized ``GROUP BY`` projection with typed
  measures (count / sum / dsum / min / max), stored as parquet.
- :class:`RollupCatalog` — registers rollups per base table and
  answers ``query(group_by, measures, where)`` requests: it picks the
  smallest covering rollup (fewest grouping columns = most pre-merged)
  or falls back to the base table. **A rewrite may never change the
  result** — measures are re-aggregated with their merge function
  (sum-of-sums, min-of-mins, count as sum), AVG is derived as
  sum/count, and filters are only pushed to a rollup when they
  reference its grouping columns alone.

Determinism note: ``dsum`` measures store floor-quantized decimal sums
(``palo_spark.suite.util.dsum`` pattern) so re-aggregation is exact
integer arithmetic — the rollup answer is bit-identical to the base
aggregation regardless of partial-sum order. A plain ``sum`` over
doubles would NOT give that guarantee (only ulp-level drift, but we
promise identity).

Scale: the rewrite's whole point is the 100 TB path — a covered query
scans |groups| pre-merged rows instead of the fact table. Maintenance
is incremental: ``apply_delta`` folds one loaded batch into every
rollup of the base (aggregate the DELTA, merge with the stored rows —
all measure kinds are mergeable by construction), which is how Doris
maintains ROLLUPs synchronously on load without re-reading the base.
``refresh`` remains as the full-rebuild fallback.
"""

from __future__ import annotations

import os
import re
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: measure kinds and their (store, merge) behavior
_KINDS = ("count", "sum", "dsum", "min", "max")


@dataclass(frozen=True)
class Measure:
    """A pre-aggregated measure: ``kind`` ∈ count|sum|dsum|min|max.

    ``dsum`` is the order-independent double sum: stored as
    ``sum(cast(floor(col*10^scale) as decimal(38,0)))`` and presented
    as ``double`` on read-out.
    """

    kind: str
    col: str | None = None  # None only for count
    scale: int = 6  # dsum quantization

    def __post_init__(self):
        if self.kind not in _KINDS:
            raise ValueError(f"unknown measure kind {self.kind!r}")
        if self.kind != "count" and self.col is None:
            raise ValueError(f"measure {self.kind} needs a column")

    @property
    def name(self) -> str:
        return f"{self.kind}_{self.col or 'all'}"

    def store_expr(self):
        """Aggregate expression evaluated over the BASE table."""
        if self.kind == "count":
            return F.count("*").alias(self.name)
        c = F.col(self.col)
        if self.kind == "sum":
            return F.sum(c).alias(self.name)
        if self.kind == "dsum":
            return F.sum(
                F.floor(c * F.lit(float(10**self.scale))).cast("decimal(38,0)")
            ).alias(self.name)
        if self.kind == "min":
            return F.min(c).alias(self.name)
        return F.max(c).alias(self.name)

    def merge_expr(self):
        """Re-aggregation over rollup rows (roll further up)."""
        c = F.col(self.name)
        if self.kind in ("count", "sum", "dsum"):
            return F.sum(c).alias(self.name)
        if self.kind == "min":
            return F.min(c).alias(self.name)
        return F.max(c).alias(self.name)

    def present_expr(self):
        """Final user-facing value from the merged column."""
        c = F.col(self.name)
        if self.kind == "dsum":
            return (c.cast("double") / F.lit(float(10**self.scale))).alias(self.name)
        return c.alias(self.name)


class Rollup:
    def __init__(
        self,
        name: str,
        base: str,
        group_cols: list[str],
        measures: list[Measure],
        location: str,
    ) -> None:
        self.name = name
        self.base = base
        self.group_cols = list(group_cols)
        self.measures = list(measures)
        self.location = location
        names = [m.name for m in measures]
        if len(set(names)) != len(names):
            raise ValueError("duplicate measure names")

    def build(self, spark: SparkSession, base_df: DataFrame) -> None:
        agg = base_df.groupBy(*self.group_cols).agg(
            *[m.store_expr() for m in self.measures]
        )
        tmp = self.location + ".__tmp"
        agg.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(self.location, ignore_errors=True)
        os.replace(tmp, self.location)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.location)

    def merge_delta(self, spark: SparkSession, delta_df: DataFrame) -> None:
        """Fold one newly loaded batch into the stored rollup WITHOUT
        touching the base table: aggregate the delta alone (store form),
        union with the stored rows, re-aggregate with each measure's
        merge function. Cost is O(|delta| + |rollup|) — at 100 TB the
        base is never re-scanned; this is Doris's synchronous rollup
        maintenance expressed as agg + merge. Exactness: count/sum/dsum
        merge by exact integer/decimal addition, min/max by min/max —
        bit-identical to a full rebuild (pytest-pinned)."""
        delta_agg = delta_df.groupBy(*self.group_cols).agg(
            *[m.store_expr() for m in self.measures]
        )
        merged = (
            self.read(spark)
            .unionByName(delta_agg)
            .groupBy(*self.group_cols)
            .agg(*[m.merge_expr() for m in self.measures])
        )
        tmp = self.location + ".__tmp"
        merged.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(self.location, ignore_errors=True)
        os.replace(tmp, self.location)


class RollupCatalog:
    """Per-base-table rollup registry + query rewriter."""

    def __init__(self, spark: SparkSession, root: str | None = None) -> None:
        self.spark = spark
        self.root = root or "/tmp/palo_spark_rollups"
        self._bases: dict[str, DataFrame] = {}
        self._rollups: dict[str, list[Rollup]] = {}

    def register_base(self, name: str, df: DataFrame) -> None:
        self._bases[name] = df

    def add_rollup(
        self, name: str, base: str, group_cols: list[str], measures: list[Measure]
    ) -> Rollup:
        if base not in self._bases:
            raise ValueError(f"unknown base table {base!r}")
        r = Rollup(name, base, group_cols, measures, os.path.join(self.root, name))
        r.build(self.spark, self._bases[base])
        self._rollups.setdefault(base, []).append(r)
        return r

    def list_rollups(self) -> list[tuple[str, str, list[str], list[str]]]:
        """(name, base, group_cols, measure names) for every rollup."""
        return [
            (r.name, base, list(r.group_cols), [m.name for m in r.measures])
            for base, rs in sorted(self._rollups.items())
            for r in rs
        ]

    def drop_rollup(self, name: str) -> bool:
        """Remove one rollup by name (and its store). Returns whether
        anything was dropped."""
        for base, rs in self._rollups.items():
            for r in rs:
                if r.name == name:
                    rs.remove(r)
                    shutil.rmtree(r.location, ignore_errors=True)
                    return True
        return False

    def refresh_rollup(self, name: str) -> bool:
        """Full rebuild of ONE rollup by name from its base."""
        for base, rs in self._rollups.items():
            for r in rs:
                if r.name == name:
                    r.build(self.spark, self._bases[base])
                    return True
        return False

    def refresh(self, base: str) -> None:
        """FULL rebuild of every rollup of a base — the fallback path
        (schema change, suspected drift). For normal loads use
        :meth:`apply_delta`, which never re-reads the base."""
        for r in self._rollups.get(base, []):
            r.build(self.spark, self._bases[base])

    def attach_table(self, base: str, table) -> None:
        """Maintain this base's rollups synchronously on every
        ``table.insert`` (Doris's load-time rollup maintenance):

        - DUPLICATE / AGGREGATE models: the loaded batch is pure-additive
          to every mergeable measure → :meth:`apply_delta` (base never
          re-scanned).
        - UNIQUE model: an upsert REPLACES rows, so a batch is not
          additive — fall back to a full :meth:`refresh` (correctness
          over speed; Doris restricts rollups on unique tables for the
          same reason). When the UNIQUE base is AUTO-PARTITIONed, use
          :class:`palo_spark.plans.partition_rollup.PartitionRollup`
          instead: partition-level versioning makes upsert maintenance
          incremental (only touched partitions recompute) — the Doris
          2.1 partition-level MV refresh model.

        The base registration is refreshed to the table's current merge
        view after each load.

        Maintenance is INSERT-driven: the table only exposes load hooks,
        so non-insert removals done through the Table API directly —
        ``delete_where``, ``truncate``, ``drop_partition`` — must be
        followed by :meth:`refresh` (PaloSession's DELETE / TRUNCATE /
        DROP PARTITION / INSERT OVERWRITE statements do this for you).
        """
        if base not in self._bases:
            # callers that pre-registered (possibly with an empty-safe
            # frame for a not-yet-loaded table) keep their registration;
            # table.read() raises on an empty table
            self.register_base(base, table.read())

        def _on_load(batch_df: DataFrame) -> None:
            # Resolve the base key at CALL time: ALTER TABLE RENAME
            # re-keys the catalog, and a hook frozen on the old name
            # would silently stop maintaining the rollups (stale MV
            # answers after the first post-rename load). The attach-time
            # key wins while it is still registered (it may be an alias,
            # not the table name); after a re-key it is gone and the
            # table's current name is the key.
            base_now = (
                base
                if base in self._bases or base in self._rollups
                else table.meta.name.lower()
            )
            if (
                table.meta.keys_type == "UNIQUE"
                or table.meta.dynamic_partition_retention > 0
            ):
                # UNIQUE: an upsert replaces rows — not additive.
                # Retention: the SAME load may also EXPIRE old
                # partitions, and apply_delta would only add the batch,
                # leaving the expired partitions' contributions in the
                # rollup forever. Both need the full re-derive.
                self.register_base(base_now, table.read())
                self.refresh(base_now)
            else:
                self.apply_delta(base_now, batch_df)
                self.register_base(base_now, table.read())

        table._on_insert.append(_on_load)

    def apply_delta(self, base: str, delta_df: DataFrame) -> None:
        """Incremental maintenance: fold one loaded batch into every
        rollup of ``base``. Call with exactly the rows of the new load
        (e.g. the batch passed to ``Table.insert``); the base DataFrame
        registered here should already include them (or be re-registered
        after the load)."""
        if base not in self._bases:
            raise ValueError(f"unknown base table {base!r}")
        for r in self._rollups.get(base, []):
            r.merge_delta(self.spark, delta_df)

    # ---------------------------------------------------------- rewrite

    def _covers(self, r: Rollup, group_by, measures, where_cols) -> bool:
        if not set(group_by) <= set(r.group_cols):
            return False
        if not set(where_cols) <= set(r.group_cols):
            return False  # filter must be applicable on rollup dims
        available = {m.name for m in r.measures}
        return all(m.name in available for m in measures)

    def choose(self, base: str, group_by, measures, where_cols=()) -> Rollup | None:
        """The selector: smallest covering rollup (fewest grouping
        columns → most pre-merged rows → cheapest scan)."""
        candidates = [
            r
            for r in self._rollups.get(base, [])
            if self._covers(r, group_by, measures, where_cols)
        ]
        if not candidates:
            return None
        return min(candidates, key=lambda r: (len(r.group_cols), r.name))

    def query(
        self,
        base: str,
        group_by: list[str],
        measures: list[Measure],
        where=None,
        where_cols: list[str] = (),
        avg_pairs: dict[str, tuple[str, str]] | None = None,
    ) -> tuple[DataFrame, str]:
        """Answer a GROUP BY query, from a rollup when one covers it.

        Returns ``(df, source)`` where source is the rollup name or
        ``"base"``. ``where`` must reference only ``where_cols`` (the
        caller declares them; predicates on non-dimension columns force
        the base path). ``avg_pairs`` derives ``avg = sum/count``
        columns from already-requested measures.
        """
        r = self.choose(base, group_by, measures, where_cols)
        if r is not None:
            df = r.read(self.spark)
            if where is not None:
                df = df.filter(where)
            out = (
                df.groupBy(*group_by)
                .agg(*[m.merge_expr() for m in measures])
                .select(*group_by, *[m.present_expr() for m in measures])
            )
            src = r.name
        else:
            df = self._bases[base]
            if where is not None:
                df = df.filter(where)
            out = (
                df.groupBy(*group_by)
                .agg(*[m.store_expr() for m in measures])
                .select(*group_by, *[m.present_expr() for m in measures])
            )
            src = "base"
        for out_name, (sum_name, cnt_name) in (avg_pairs or {}).items():
            out = out.withColumn(out_name, F.col(sum_name) / F.col(cnt_name))
        return out, src

    # -------------------------------------------------------- SQL rewrite

    def sql(self, sql_text: str) -> tuple[DataFrame, str]:
        """Doris's silent MV selection for SQL queries: if ``sql_text``
        is a simple aggregate over a registered base that a rollup
        covers, answer it from the rollup; otherwise pass through to
        ``spark.sql`` untouched (base tables must be registered as temp
        views for the fallback). Returns ``(df, source)`` with source =
        the rollup name, ``"base-sql"`` (recognized shape, no covering
        rollup) or ``"spark"`` (shape outside the rewriter's grammar).

        Grammar (a deliberate subset — everything else falls through,
        never mis-answers): single table, optional WHERE, GROUP BY of
        bare columns, select list of group columns and COUNT(*) /
        SUM / MIN / MAX over bare columns with optional aliases.
        ``SUM(c)`` matches a stored ``sum_c`` or ``dsum_c`` measure
        (dsum is this engine's order-independent double sum — its
        quantized value IS the documented sum semantic here).
        """
        parsed = _parse_simple_agg_sql(sql_text)
        if parsed is not None:
            base, group_cols, items, where_text, where_cols = parsed
            if base in self._bases:
                hit = self._match_rollup(base, group_cols, items, where_cols)
                if hit is not None:
                    r, measures = hit
                    df = r.read(self.spark)
                    if where_text:
                        df = df.filter(F.expr(where_text))
                    out = (
                        df.groupBy(*group_cols)
                        .agg(*[m.merge_expr() for m in measures])
                        .select(*group_cols, *[m.present_expr() for m in measures])
                    )
                    sel = []
                    mi = 0
                    for it in items:
                        if it["kind"] == "group":
                            sel.append(F.col(it["col"]).alias(it["alias"]))
                        else:
                            sel.append(F.col(measures[mi].name).alias(it["alias"]))
                            mi += 1
                    return out.select(*sel), r.name
                return self.spark.sql(sql_text), "base-sql"
        return self.spark.sql(sql_text), "spark"

    def _match_rollup(self, base, group_cols, items, where_cols):
        """Find the cheapest rollup whose dims cover group+where columns
        and whose stored measures cover every aggregate item; returns
        ``(rollup, [Measure per agg item in order])`` or None."""
        agg_items = [it for it in items if it["kind"] == "agg"]
        best = None
        for r in self._rollups.get(base, []):
            if not (set(group_cols) <= set(r.group_cols)):
                continue
            if not (set(where_cols) <= set(r.group_cols)):
                continue
            by_name = {m.name: m for m in r.measures}
            picked = []
            for it in agg_items:
                m = None
                for cand in it["measure_names"]:
                    if cand in by_name:
                        m = by_name[cand]
                        break
                if m is None:
                    break
                picked.append(m)
            else:
                if best is None or (len(r.group_cols), r.name) < (
                    len(best[0].group_cols),
                    best[0].name,
                ):
                    best = (r, picked)
        return best


# ------------------------------------------------------ SQL-shape parsing

_SQL_AGG_RE = re.compile(
    r"^\s*SELECT\s+(?P<select>.+?)\s+FROM\s+(?P<table>\w+)"
    r"(?:\s+WHERE\s+(?P<where>.+?))?"
    r"\s+GROUP\s+BY\s+(?P<group>[\w\s,]+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ITEM_AGG_RE = re.compile(
    # AVG parses (r11: the async-MV rewrite derives it as
    # SUM(sum_x)/SUM(count_x)); it is NOT a storable rollup measure —
    # every storage-side consumer checks the kind and declines
    r"^(?P<func>COUNT|SUM|MIN|MAX|AVG)\s*\(\s*(?P<arg>\*|\w+)\s*\)"
    r"(?:\s+AS\s+(?P<alias>\w+))?$",
    re.IGNORECASE,
)
_ITEM_COL_RE = re.compile(r"^(?P<col>\w+)(?:\s+AS\s+(?P<alias>\w+))?$", re.IGNORECASE)
_SQL_KEYWORDS = {
    "and", "or", "not", "in", "between", "like", "is", "null",
    "true", "false", "date", "timestamp", "interval", "case", "when",
    "then", "else", "end", "cast", "as",
}


def _parse_simple_agg_sql(sql_text: str):
    m = _SQL_AGG_RE.match(sql_text)
    if m is None:
        return None
    group_cols = [g.strip() for g in m.group("group").split(",")]
    if not all(re.fullmatch(r"\w+", g) for g in group_cols):
        return None
    items = []
    for raw in m.group("select").split(","):
        raw = raw.strip()
        am = _ITEM_AGG_RE.match(raw)
        if am:
            func, arg = am.group("func").lower(), am.group("arg")
            if func == "count" and arg == "*":
                names, default_alias = ["count_all"], "count_all"
            elif arg != "*":
                names = [f"{func}_{arg}"]
                if func == "sum":
                    names.append(f"dsum_{arg}")  # engine's exact double sum
                default_alias = f"{func}_{arg}"
            else:
                return None  # MIN(*) etc — not a shape we answer
            items.append(
                {
                    "kind": "agg",
                    "measure_names": names,
                    "alias": am.group("alias") or default_alias,
                }
            )
            continue
        cm = _ITEM_COL_RE.match(raw)
        if cm and cm.group("col") in group_cols:
            items.append(
                {
                    "kind": "group",
                    "col": cm.group("col"),
                    "alias": cm.group("alias") or cm.group("col"),
                }
            )
            continue
        return None  # expression outside the grammar → pass through
    where_text = (m.group("where") or "").strip() or None
    where_cols = []
    if where_text:
        no_strings = re.sub(r"'[^']*'", "", where_text)
        where_cols = [
            w
            for w in set(re.findall(r"[A-Za-z_]\w*", no_strings))
            if w.lower() not in _SQL_KEYWORDS
        ]
    return m.group("table"), group_cols, items, where_text, where_cols


# ---------------------------------------------- join-agg shape parsing

_JOIN_SQL_RE = re.compile(
    r"^\s*SELECT\s+(?P<select>.+?)\s+FROM\s+(?P<frm>.+?)"
    r"(?:\s+WHERE\s+(?P<where>.+?))?"
    r"\s+GROUP\s+BY\s+(?P<group>[\w\s,.`]+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
#: alias may follow the table name (optionally via AS) but must not be
#: a clause keyword — the lookahead keeps `t1 JOIN t2` from parsing
#: `JOIN` as t1's alias
_T_ALIAS = (
    r"`?(?P<t>\w+)`?"
    r"(?:\s+(?:AS\s+)?(?!JOIN\b|INNER\b|LEFT\b|RIGHT\b|FULL\b|CROSS\b"
    r"|ON\b|WHERE\b|GROUP\b)`?(?P<a>\w+)`?)?"
)
_JOIN_STEP_RE = re.compile(
    r"\s+(?:INNER\s+)?JOIN\s+" + _T_ALIAS.replace("<t>", "<jt>").replace("<a>", "<ja>")
    + r"\s+ON\s+(?P<on>.+?)(?=\s+(?:INNER\s+|LEFT\s+|RIGHT\s+|FULL\s+"
    r"|CROSS\s+)?JOIN\s+|\s*$)",
    re.IGNORECASE | re.DOTALL,
)
_EQ_COND_RE = re.compile(
    r"^`?(\w+)`?\.`?(\w+)`?\s*=\s*`?(\w+)`?\.`?(\w+)`?$"
)
_J_ITEM_AGG_RE = re.compile(
    r"^(?P<func>COUNT|SUM|MIN|MAX|AVG)\s*\(\s*"
    r"(?:`?(?P<qual>\w+)`?\.)?`?(?P<arg>\*|\w+)`?\s*\)"
    r"(?:\s+AS\s+`?(?P<alias>\w+)`?)?$",
    re.IGNORECASE,
)
_J_ITEM_COL_RE = re.compile(
    r"^(?:`?(?P<qual>\w+)`?\.)?`?(?P<col>\w+)`?"
    r"(?:\s+AS\s+`?(?P<alias>\w+)`?)?$",
    re.IGNORECASE,
)


def _parse_join_agg_sql(sql_text: str, columns_of=None):
    """Parse ``SELECT dims+aggs FROM t1 [a1] JOIN t2 [a2] ON a.k = b.k
    [AND ...] [JOIN ...] [WHERE ...] GROUP BY dims`` — the join-body
    async-MV grammar ([docs: async-materialized-view] — upstream's
    Nereids rewrite matches queries against MVs whose body joins
    fact x dim). INNER equi-joins only; every other shape returns None
    (the caller falls back to computing from the bases, which is
    always correct).

    Columns are resolved to (table, column) pairs through the alias
    map; unqualified columns resolve via ``columns_of(table) ->
    set[str] | None`` and must be unambiguous across the joined
    tables. Returns a dict with:

    - ``alias_map``: alias/name (lower) -> table name (lower)
    - ``tables``: frozenset of table names
    - ``join_keys``: frozenset of frozenset({(t, c), (t, c)}) equalities
    - ``items``: select items in order — {"kind": "group", "ref": (t,c),
      "alias": out} or {"kind": "agg", "func": f, "ref": (t,c) | None
      for COUNT(*), "alias": out}
    - ``where`` / ``where_refs``: residual filter text and the (t, c)
      pairs it references (None where on no filter)

    or None when the text is outside the grammar or a column cannot be
    resolved to exactly one joined table."""
    m = _JOIN_SQL_RE.match(sql_text)
    if m is None:
        return None
    frm = m.group("frm")
    head = re.match(r"^\s*" + _T_ALIAS, frm, re.IGNORECASE)
    if head is None:
        return None
    alias_map: dict[str, str] = {}

    def add(tbl: str, alias: str | None) -> bool:
        tbl = tbl.lower()
        key = (alias or tbl).lower()
        if key in alias_map or tbl in alias_map.values():
            return False  # duplicate alias / self-join — out of grammar
        alias_map[key] = tbl
        return True

    if not add(head.group("t"), head.group("a")):
        return None
    pos = head.end()
    join_steps = []
    for jm in _JOIN_STEP_RE.finditer(frm, pos):
        if jm.start() != pos:
            return None  # unmatched text between steps (e.g. LEFT JOIN)
        pos = jm.end()
        if not add(jm.group("jt"), jm.group("ja")):
            return None
        join_steps.append(jm.group("on"))
    if pos != len(frm.rstrip()) and frm[pos:].strip():
        return None
    if not join_steps:
        return None  # single-table text — the simple-agg parser's job

    _col_cache: dict[str, set | None] = {}

    def cols_of(tbl: str):
        if tbl not in _col_cache:
            _col_cache[tbl] = columns_of(tbl) if columns_of else None
        return _col_cache[tbl]

    def resolve(qual: str | None, col: str):
        """(table, column) for a reference, or None when unresolvable."""
        col = col.lower()
        if qual is not None:
            tbl = alias_map.get(qual.lower())
            return (tbl, col) if tbl else None
        owners = [
            t for t in alias_map.values()
            if (cols_of(t) or set()) and col in cols_of(t)
        ]
        return (owners[0], col) if len(owners) == 1 else None

    join_keys = set()
    for on in join_steps:
        for cond in re.split(r"\s+AND\s+", on.strip(), flags=re.IGNORECASE):
            em = _EQ_COND_RE.match(cond.strip())
            if em is None:
                return None
            l = resolve(em.group(1), em.group(2))
            r = resolve(em.group(3), em.group(4))
            if l is None or r is None or l[0] == r[0]:
                return None
            join_keys.add(frozenset((l, r)))

    group_refs = []
    for g in m.group("group").split(","):
        gm = _J_ITEM_COL_RE.match(g.strip())
        if gm is None or gm.group("alias"):
            return None
        ref = resolve(gm.group("qual"), gm.group("col"))
        if ref is None:
            return None
        group_refs.append(ref)

    items = []
    for raw in _split_select_items(m.group("select")):
        raw = raw.strip()
        am = _J_ITEM_AGG_RE.match(raw)
        if am:
            func = am.group("func").lower()
            if am.group("arg") == "*":
                if func != "count" or am.group("qual"):
                    return None
                ref = None
                default = "count_all"
            else:
                ref = resolve(am.group("qual"), am.group("arg"))
                if ref is None:
                    return None
                default = f"{func}_{ref[1]}"
            items.append({
                "kind": "agg", "func": func, "ref": ref,
                "alias": (am.group("alias") or default).lower(),
            })
            continue
        cm = _J_ITEM_COL_RE.match(raw)
        if cm:
            ref = resolve(cm.group("qual"), cm.group("col"))
            if ref is None or ref not in group_refs:
                return None
            items.append({
                "kind": "group", "ref": ref,
                "alias": (cm.group("alias") or ref[1]).lower(),
            })
            continue
        return None
    where_text = (m.group("where") or "").strip() or None
    where_refs = []
    if where_text:
        no_strings = re.sub(r"'[^']*'", "", where_text)
        for qual, col in re.findall(
            r"(?:`?([A-Za-z_]\w*)`?\.)?`?([A-Za-z_]\w*)`?", no_strings
        ):
            if not qual and col.lower() in _SQL_KEYWORDS:
                continue
            ref = resolve(qual or None, col)
            if ref is None:
                return None
            where_refs.append(ref)
    return {
        "alias_map": alias_map,
        "tables": frozenset(alias_map.values()),
        "join_keys": frozenset(join_keys),
        "group_refs": group_refs,
        "items": items,
        "where": where_text,
        "where_refs": where_refs,
        # raw FROM text (same dialect as the input) — the join-body
        # incremental refresh re-renders the slice query from it
        "frm_text": frm,
    }


def _split_select_items(select: str) -> list[str]:
    """Split a select list on top-level commas (commas inside agg
    parens don't occur in this grammar, but keep it paren-aware so a
    future extension doesn't silently mis-split)."""
    out, depth, cur = [], 0, []
    for ch in select:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out
