"""Property-based tests (hypothesis) for the custom kernels — the parts
of the engine that are NOT Catalyst's responsibility and therefore carry
real correctness risk: sketch codecs/algebra, the quantile sketch's rank
bound, the vectorized funnel kernel, and the UNIQUE-key merge model.

Pure-python kernel properties run hundreds of random examples; the one
Spark round-trip property keeps a small example budget (JVM latency)."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# ----------------------------------------------------------- bitmap algebra

_ints = st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=60)


@given(_ints, _ints)
@settings(max_examples=200, deadline=None)
def test_bitmap_algebra_matches_python_sets(a, b):
    from palo_spark.functions.sketches import _bm_de, _bm_ser

    ba = _bm_ser(np.unique(np.array(a, dtype="<i8")))
    bb = _bm_ser(np.unique(np.array(b, dtype="<i8")))
    sa, sb = set(a), set(b)
    assert set(np.intersect1d(_bm_de(ba), _bm_de(bb)).tolist()) == (sa & sb)
    assert set(np.union1d(_bm_de(ba), _bm_de(bb)).tolist()) == (sa | sb)
    assert set(np.setdiff1d(_bm_de(ba), _bm_de(bb)).tolist()) == (sa - sb)
    assert set(np.setxor1d(_bm_de(ba), _bm_de(bb)).tolist()) == (sa ^ sb)
    # serialization round-trips exactly
    assert _bm_de(ba).tolist() == sorted(sa)


@given(st.lists(st.lists(st.integers(min_value=0, max_value=10**6), max_size=30), max_size=6))
@settings(max_examples=100, deadline=None)
def test_bitmap_union_is_order_independent(parts):
    from palo_spark.functions.sketches import _bm_de, _bm_ser

    sers = [_bm_ser(np.unique(np.array(p, dtype="<i8"))) for p in parts]
    def union(order):
        if not order:
            return []
        acc = np.empty(0, dtype="<i8")
        for i in order:
            acc = np.union1d(acc, _bm_de(sers[i]))
        return acc.tolist()

    fwd = union(list(range(len(sers))))
    rev = union(list(reversed(range(len(sers)))))
    assert fwd == rev == sorted(set().union(*map(set, parts)) if parts else set())


# ------------------------------------------------------------ HLL properties


@given(st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=500))
@settings(max_examples=50, deadline=None)
def test_hll_merge_equals_single_pass_and_bounds_error(values):
    from palo_spark.functions.sketches import _hll_add, _hll_empty, _hll_estimate

    whole = _hll_empty()
    _hll_add(whole, values)
    # split into two partials, merge by register max — must be identical
    mid = len(values) // 2
    p1, p2 = _hll_empty(), _hll_empty()
    _hll_add(p1, values[:mid])
    _hll_add(p2, values[mid:])
    merged = np.maximum(p1, p2)
    assert np.array_equal(whole, merged)
    # estimate within a generous bound (p=12 → ~1.6% rse; allow 10%+small-n slack)
    n = len(set(values))
    est = _hll_estimate(whole)
    assert abs(est - n) <= max(3, 0.1 * n)


# ----------------------------------------------------- quantile sketch bound


@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=5, max_size=400
    ),
    st.floats(min_value=0.05, max_value=0.95),
)
@settings(max_examples=60, deadline=None)
def test_quantile_sketch_rank_error_bound(values, p):
    from palo_spark.functions.sketches import _qs_compress, _qs_quantile

    arr = np.asarray(values, dtype="<f8")
    m, w = _qs_compress(arr, np.ones_like(arr))
    est = _qs_quantile(m, w, p)
    # with ties the estimate's rank is an interval [P(x<est), P(x<=est)];
    # that interval must intersect the ±(~2 centroids) band around p
    rank_lo = float(np.mean(arr < est))
    rank_hi = float(np.mean(arr <= est))
    tol = 2.0 * max(1.0 / 256, 1.0 / len(arr)) + 1.0 / len(arr)
    assert rank_lo <= p + tol + 1e-9 and rank_hi >= p - tol - 1e-9


# ------------------------------------------------------------- funnel kernel


def _funnel_reference(t, fl, window_ns):
    """Obvious O(starts·levels·n) scalar reference for 'default' mode."""
    best = 0
    for s in range(len(t)):
        if not fl[0][s]:
            continue
        best = max(best, 1)
        deadline = t[s] + window_ns
        pos, level = s, 1
        for step in range(1, len(fl)):
            nxt = None
            for i in range(pos + 1, len(t)):
                if fl[step][i] and t[i] <= deadline:
                    nxt = i
                    break
            if nxt is None:
                break
            pos, level = nxt, level + 1
        best = max(best, level)
    return best


@given(
    st.integers(min_value=2, max_value=4),
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=40),
    st.data(),
)
@settings(max_examples=120, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_funnel_kernel_matches_reference(n_conds, ts_raw, data):
    from palo_spark.functions.behavioral import _funnel_core

    t = np.sort(np.array(ts_raw, dtype="int64"))
    fl = [
        np.array(
            data.draw(st.lists(st.booleans(), min_size=len(t), max_size=len(t))),
            dtype=bool,
        )
        for _ in range(n_conds)
    ]
    window = data.draw(st.integers(min_value=0, max_value=60))
    assert _funnel_core(t, fl, window) == _funnel_reference(t, fl, window)


# -------------------------------------------------- UNIQUE-key merge model


def test_unique_table_matches_dict_model(spark, tmp_path):
    """Randomized insert sequences vs a dict reference: last version wins,
    sequence column overrides version order. One Spark table, several
    random batches (bounded — JVM latency makes per-example sessions
    impractical, so this is a seeded random sweep, not @given)."""
    import random

    from pyspark.sql import Row

    from palo_spark.tables import Table

    rng = random.Random(1234)
    t = Table(
        spark, "prop_uniq", "UNIQUE", ["k"], sequence_col="seq",
        location=str(tmp_path / "t"),
    )
    model: dict[int, tuple] = {}  # k -> (seq, version, payload)
    for version in range(1, 6):
        batch, in_batch = [], {}
        for _ in range(rng.randint(1, 12)):
            k = rng.randint(0, 7)
            seq = rng.randint(0, 5)
            payload = f"v{version}-{rng.randint(0, 99)}"
            row = (k, seq, payload)
            # in-batch: same merge rule (higher seq wins; later row wins ties
            # is NOT guaranteed by the engine, so make in-batch keys unique)
            in_batch[k] = row
            batch = list(in_batch.values())
        t.insert(spark.createDataFrame([Row(k=k, seq=s, x=p) for k, s, p in batch]))
        for k, s, p in batch:
            cur = model.get(k)
            if cur is None or (s, version) >= (cur[0], cur[1]):
                model[k] = (s, version, p)
    got = {r["k"]: (r["seq"], r["x"]) for r in t.read().collect()}
    want = {k: (s, p) for k, (s, v, p) in model.items()}
    assert got == want


# ----------------------------------------------------- sequence regex kernel


def _seq_count_reference(letters: str, steps: list[str]) -> int:
    """Non-overlapping minimal '(?1).*(?2)...' chains, scalar reference:
    scan left to right; after completing a chain, restart after its end."""
    n, i, count = len(letters), 0, 0
    while True:
        pos = i
        ok = True
        for s in steps:
            j = letters.find(s, pos)
            if j < 0:
                ok = False
                break
            pos = j + 1
        if not ok:
            break
        count += 1
        i = pos
    return count


@given(
    st.text(alphabet="abc", max_size=60),
    st.integers(min_value=2, max_value=3),
)
@settings(max_examples=200, deadline=None)
def test_sequence_count_pattern_matches_reference(letters, n_steps):
    from palo_spark.functions.behavioral import _compile_pattern

    steps = [chr(ord("a") + i) for i in range(n_steps)]
    pattern = ".*".join(f"(?{i+1})" for i in range(n_steps))
    rx = _compile_pattern(pattern, 3)
    assert len(rx.findall(letters)) == _seq_count_reference(letters, steps)


# ------------------------------------------------- sampling hash kernel


def _minstd_u(i: int, seed: int) -> float:
    """Pure-python mirror of the oracle-replayable sampling hash
    (three iterated Lehmer rounds — see operators/sampling.py)."""
    mod = 2147483647
    h = ((i + seed) % mod + mod) % mod
    for _ in range(3):
        h = h * 48271 % mod
    return float(h) / float(mod)


@given(
    st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=40),
    st.integers(min_value=0, max_value=2**20),
)
@settings(max_examples=60, deadline=None)
def test_minstd_hash_python_mirror(ids, seed):
    """The SQL-replayable arithmetic (o_hash_u) and the pure-python
    mirror agree bit-for-bit — the property that makes the oracle
    comparison exact rather than statistical."""
    from palo_spark.operators.sampling import o_hash_u

    import duckdb

    con = duckdb.connect()
    for i in ids:
        got = con.execute(f"SELECT {o_hash_u(str(i), seed)}").fetchone()[0]
        assert got == _minstd_u(i, seed)


def test_minstd_uniformity():
    """Decile occupancy of the sampling hash over a contiguous id range
    is near-uniform (each decile within 25% of expectation) — adequate
    dispersion for fraction sampling."""
    n = 20000
    buckets = [0] * 10
    for i in range(n):
        buckets[int(_minstd_u(i, 7) * 10)] += 1
    assert all(abs(b - n / 10) < n / 10 * 0.25 for b in buckets)


# --------------------------------------------------- chunking kernel


def _chunks_py(tokens, size, overlap):
    step = size - overlap
    n = len(tokens)
    starts = list(range(0, max(n - overlap, 1), step))
    return [tokens[s:s + size] for s in starts]


@given(
    st.integers(min_value=0, max_value=120),
    st.integers(min_value=2, max_value=40),
    st.integers(min_value=0, max_value=39),
)
@settings(max_examples=80, deadline=None)
def test_chunk_window_math(n_tokens, size, overlap):
    """The start-sequence arithmetic used by chunk_documents (1-based
    sequence to n-overlap by step) equals the reference windowing:
    full coverage, exact overlap, tail chunk longer than overlap."""
    if overlap >= size:
        overlap = size - 1
    step = size - overlap
    n = max(n_tokens, 1)  # split() never yields an empty array
    bound = max(n - overlap, 1)
    starts = list(range(1, bound + 1, step))
    py = _chunks_py(list(range(n)), size, overlap)
    assert len(starts) == len(py)
    covered = set()
    for s, ref in zip(starts, py):
        chunk = list(range(s - 1, min(s - 1 + size, n)))
        assert chunk == ref
        covered.update(chunk)
    assert covered == set(range(n))  # every token in some chunk


def test_unique_delete_sign_matches_dict_model(spark, tmp_path):
    """Randomized MERGE-load sequences (rows randomly carrying the hidden
    delete sign) vs a dict reference: the winning (seq, version) row's
    sign decides visibility; compaction at random points must not change
    the visible state. Seeded sweep, same rationale as
    test_unique_table_matches_dict_model."""
    import random

    from pyspark.sql import Row

    from palo_spark.tables import DELETE_SIGN_COL, Table

    rng = random.Random(4321)
    t = Table(
        spark, "prop_dsign", "UNIQUE", ["k"], sequence_col="seq",
        location=str(tmp_path / "t"),
    )
    model: dict[int, tuple] = {}  # k -> (seq, version, payload, sign)
    for version in range(1, 7):
        in_batch: dict[int, tuple] = {}
        for _ in range(rng.randint(1, 12)):
            k = rng.randint(0, 7)
            seq = rng.randint(0, 5)
            sign = rng.randint(0, 4) == 0  # ~20% deletes
            in_batch[k] = (k, seq, f"v{version}-{rng.randint(0, 99)}", sign)
        batch = list(in_batch.values())
        t.insert(
            spark.createDataFrame(
                [
                    Row(k=k, seq=s, x=p, **{DELETE_SIGN_COL: int(g)})
                    for k, s, p, g in batch
                ]
            )
        )
        for k, s, p, g in batch:
            cur = model.get(k)
            if cur is None or (s, version) >= (cur[0], cur[1]):
                model[k] = (s, version, p, g)
        if rng.random() < 0.3:
            t.compact()
            assert t.meta.has_delete_sign is False
            # compaction folds away defeated rows: the model keeps only
            # visible keys, whose sign is now implicitly 0
            model = {
                k: (s, v, p, False)
                for k, (s, v, p, g) in model.items()
                if not g
            }
    got = {r["k"]: (r["seq"], r["x"]) for r in t.read().collect()}
    want = {k: (s, p) for k, (s, v, p, g) in model.items() if not g}
    assert got == want


def test_unique_partial_and_sign_phases_match_dict_model(spark, tmp_path):
    """Randomized interleaving of the two r8 load modes — partial-column
    phases and delete-sign phases — with compact() at each mode switch
    (the engine's required protocol for mixing them). The dict model
    applies: full/sign rows replace wholesale and set visibility;
    partial rows update only carried columns, creating NULL-padded rows
    for unknown keys (the post-delete contract pin)."""
    import random

    from pyspark.sql import Row

    from palo_spark.tables import DELETE_SIGN_COL, Table

    rng = random.Random(99)
    t = Table(
        spark, "prop_mix", "UNIQUE", ["k"], location=str(tmp_path / "t")
    )
    t.insert(
        spark.createDataFrame(
            [Row(k=k, name=f"n{k}", bal=float(k)) for k in range(6)]
        )
    )
    # model: k -> {"name","bal","visible"}
    model = {k: {"name": f"n{k}", "bal": float(k), "visible": True} for k in range(6)}
    mode = None
    for phase in range(6):
        new_mode = rng.choice(["sign", "partial"])
        if mode is not None and new_mode != mode:
            t.compact()
            model = {k: r for k, r in model.items() if r["visible"]}
        mode = new_mode
        in_batch: dict[int, tuple] = {}
        for _ in range(rng.randint(1, 8)):
            k = rng.randint(0, 9)
            if mode == "sign":
                in_batch[k] = (k, f"s{phase}-{k}", float(rng.randint(0, 99)),
                               int(rng.random() < 0.3))
            else:
                in_batch[k] = (k, float(rng.randint(100, 199)))
        if mode == "sign":
            t.insert(spark.createDataFrame(
                list(in_batch.values()),
                f"k long, name string, bal double, {DELETE_SIGN_COL} int"))
            for k, nm, b, g in in_batch.values():
                model[k] = {"name": nm, "bal": b, "visible": g == 0}
        else:
            t.insert(spark.createDataFrame(
                list(in_batch.values()), "k long, bal double"),
                partial_columns=True)
            for k, b in in_batch.values():
                cur = model.get(k)
                if cur is None or not cur["visible"]:
                    # unknown or hidden key: partial row creates/overrides
                    # with NULL-padded missing columns (post-delete pin)
                    model[k] = {"name": None, "bal": b, "visible": True}
                else:
                    cur["bal"] = b
    got = {r["k"]: (r["name"], r["bal"]) for r in t.read().collect()}
    want = {k: (r["name"], r["bal"]) for k, r in model.items() if r["visible"]}
    assert got == want


def test_unique_schema_change_phases_match_dict_model(spark, tmp_path):
    """Randomized interleaving of light schema changes (ADD with default,
    RENAME, DROP, drop+re-ADD of a recycled name) with full loads,
    partial-column loads, key-predicate DELETEs, TRUNCATE, and
    compaction, vs a dict reference.

    Model semantics (the engine's documented contract):
    - ADD COLUMN default d: every existing row surfaces d; later full
      loads omitting the optional column write d; partial loads update
      it only when carried; a drop+re-add is a NEW column (old stored
      values never resurrect).
    - RENAME: pure metadata, applied to rowsets (and recorded partial
      carried-column lists) at read.
    - DROP: column disappears; partial batches may no longer write it.
    - Full load: replaces the whole row (key-wise latest version wins).
    - Partial load: updates only carried columns; an unknown key gets
      NULL for never-carried original columns and the declared default
      for added columns.
    - DELETE (key predicate, only when no partial rowsets are live —
      the engine refuses otherwise): removes every currently-stored
      matching key; later loads are unaffected.
    - TRUNCATE: clears all rows; schema metadata survives.
    """
    import random

    from palo_spark.tables import Table

    rng = random.Random(20260815)
    t = Table(
        spark, "prop_schema", "UNIQUE", ["k"], location=str(tmp_path / "t")
    )
    # live value columns: name -> declared default (None for originals)
    cols: dict[str, float | None] = {"a": None, "b": None}
    t.insert(
        spark.createDataFrame(
            [(k, float(k), float(10 * k)) for k in range(4)],
            "k long, a double, b double",
        )
    )
    model: dict[int, dict] = {
        k: {"a": float(k), "b": float(10 * k)} for k in range(4)
    }
    fresh = 0  # counter for generated column names
    dropped_names: list[str] = []  # recyclable for drop+re-add
    renamed_away: list[str] = []  # recyclable: old names freed by RENAME
    live_partials = False  # any partial rowset since the last compact
    for _ in range(16):
        op = rng.choices(
            ["full", "partial", "add", "rename", "drop", "compact",
             "delete", "truncate"],
            weights=[26, 26, 12, 9, 9, 8, 7, 3],
        )[0]
        live = sorted(cols)
        if op == "full":
            # carry all original (no-default) columns; carry each added
            # column with p=0.5 (omitted -> its default is written)
            carried = [c for c in live if cols[c] is None or rng.random() < 0.5]
            ks = rng.sample(range(8), rng.randint(1, 5))
            rows = [
                tuple([k] + [float(rng.randint(0, 99)) for _ in carried])
                for k in ks
            ]
            schema = ", ".join(["k long"] + [f"{c} double" for c in carried])
            t.insert(spark.createDataFrame(rows, schema))
            for row in rows:
                k = row[0]
                vals = dict(zip(carried, row[1:]))
                model[k] = {c: vals.get(c, cols[c]) for c in live}
        elif op == "partial":
            n = rng.randint(1, len(live))
            carried = sorted(rng.sample(live, n))
            ks = rng.sample(range(8), rng.randint(1, 4))
            rows = [
                tuple([k] + [float(rng.randint(100, 199)) for _ in carried])
                for k in ks
            ]
            schema = ", ".join(["k long"] + [f"{c} double" for c in carried])
            t.insert(
                spark.createDataFrame(rows, schema), partial_columns=True
            )
            live_partials = True
            for row in rows:
                k = row[0]
                vals = dict(zip(carried, row[1:]))
                cur = model.get(k)
                if cur is None:
                    # new key: carried values; defaults for added columns;
                    # NULL for never-carried originals
                    model[k] = {c: vals.get(c, cols[c]) for c in live}
                else:
                    cur.update(vals)
        elif op == "add":
            # recycle a dropped or renamed-away name half the time —
            # a reused name is a NEW column either way
            pool = dropped_names + renamed_away
            if pool and rng.random() < 0.5:
                name = rng.choice(pool)
                if name in dropped_names:
                    dropped_names.remove(name)
                else:
                    renamed_away.remove(name)
            else:
                fresh += 1
                name = f"c{fresh}"
            default = float(rng.randint(500, 599))
            t.add_column(name, "double", default=default)
            cols[name] = default
            for r in model.values():
                r[name] = default  # old stored incarnations never resurrect
        elif op == "rename":
            fresh += 1
            old = rng.choice(live)
            new = f"r{fresh}"
            t.rename_column(old, new)
            cols[new] = cols.pop(old)
            renamed_away.append(old)
            for r in model.values():
                r[new] = r.pop(old)
        elif op == "drop":
            if len(live) < 2:
                continue  # keep >=1 value column for partial batches
            victim = rng.choice(live)
            t.drop_column(victim)
            cols.pop(victim)
            dropped_names.append(victim)
            for r in model.values():
                r.pop(victim)
        elif op == "delete":
            if live_partials or not model:
                continue  # engine refuses DELETE over live partial rowsets
            lo = rng.randint(0, 7)
            t.delete_where(f"k >= {lo}")
            model = {k: r for k, r in model.items() if k < lo}
        elif op == "truncate":
            t.truncate()
            model = {}
            live_partials = False
        else:
            t.compact()
            live_partials = False
    live = sorted(cols)
    try:
        rows_out = t.read().collect()
    except ValueError:
        rows_out = []  # truncated empty table: read() raises "no data"
    got = {r["k"]: tuple(r[c] for c in live) for r in rows_out}
    want = {k: tuple(r[c] for c in live) for k, r in model.items()}
    assert got == want


def test_unique_partial_with_sequence_matches_dict_model(spark, tmp_path):
    """Randomized full + partial loads on a sequence_col table (the r9
    feature: partial update × sequence) vs a dict reference. Per-column
    winner = argmax over (carried, seq, version); full rows carry every
    column. Compaction at random points must not change the visible
    state. Seeded sweep, same rationale as the other dict models."""
    import random

    from pyspark.sql import Row

    from palo_spark.tables import Table

    rng = random.Random(777)
    t = Table(
        spark, "prop_pseq", "UNIQUE", ["k"], sequence_col="seq",
        location=str(tmp_path / "t"),
    )
    t.insert(spark.createDataFrame(
        [Row(k=k, seq=0, a=f"a{k}", b=f"b{k}") for k in range(5)]))
    # model: k -> per-column (seq, version, value) for a, b, and seq itself
    model = {
        k: {"a": (0, 1, f"a{k}"), "b": (0, 1, f"b{k}"), "seq": (0, 1, 0)}
        for k in range(5)
    }

    def win(cur, cand):
        return cand if cand[:2] >= cur[:2] else cur

    for version in range(2, 9):
        partial = rng.random() < 0.6
        carried = rng.choice([["a"], ["b"], ["a", "b"]]) if partial else ["a", "b"]
        in_batch: dict[int, tuple] = {}
        for _ in range(rng.randint(1, 6)):
            k = rng.randint(0, 7)
            in_batch[k] = (k, rng.randint(0, 5),
                           *[f"{c}{version}-{rng.randint(0,9)}" for c in carried])
        rows = [Row(k=k, seq=s, **dict(zip(carried, vs)))
                for k, s, *vs in in_batch.values()]
        t.insert(spark.createDataFrame(rows), partial_columns=partial)
        for k, s, *vs in in_batch.values():
            cur = model.setdefault(
                k, {"a": (-1, -1, None), "b": (-1, -1, None), "seq": (-1, -1, None)}
            )
            for c, v in zip(carried, vs):
                cur[c] = win(cur[c], (s, version, v))
            cur["seq"] = win(cur["seq"], (s, version, s))
        if rng.random() < 0.25:
            t.compact()
    got = {r["k"]: (r["seq"], r["a"], r["b"]) for r in t.read().collect()}
    want = {k: (m["seq"][2], m["a"][2], m["b"][2]) for k, m in model.items()}
    assert got == want
