"""asof_join: backward/forward semantics, tolerance, ties, collisions."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from palo_spark.operators.temporal import asof_join


def _t(m):
    return dt.datetime(2024, 1, 1, 0, m, 0)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, _t(10), "a"), (1, _t(2), "b"), (2, _t(5), "c"), (3, _t(7), "d")],
        "k int, ts timestamp_ntz, lv string",
    )
    right = spark.createDataFrame(
        [(1, _t(3), 100), (1, _t(10), 200), (2, _t(9), 300)],
        "k int, ts timestamp_ntz, rv int",
    )
    return left, right


def test_backward_inclusive(frames):
    left, right = frames
    out = {
        r["lv"]: (r["rv"], r["matched_ts"])
        for r in asof_join(left, right, on="k").collect()
    }
    assert out["a"] == (200, _t(10))  # equal ts matches (inclusive)
    assert out["b"] == (None, None)  # nothing at or before 0:02
    assert out["c"] == (None, None)  # right row is later
    assert out["d"] == (None, None)  # no right rows for key 3
    assert len(out) == 4


def test_forward_and_tolerance(frames):
    left, right = frames
    fwd = {
        r["lv"]: r["rv"]
        for r in asof_join(left, right, on="k", direction="forward").collect()
    }
    assert fwd == {"a": 200, "b": 100, "c": 300, "d": None}
    tol = {
        r["lv"]: r["rv"]
        for r in asof_join(
            left, right, on="k", direction="forward", tolerance=60
        ).collect()
    }
    # b: gap 0:02->0:03 = 60s kept; c: 0:05->0:09 = 240s nulled out
    assert tol == {"a": 200, "b": 100, "c": None, "d": None}


def test_column_collision_fails_loud(frames):
    left, right = frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("rv", "lv"), on="k")


def test_matched_ts_output_collision_fails_loud(spark, frames):
    _, right = frames
    left = spark.createDataFrame(
        [(1, _t(6), "x")], "k int, ts timestamp_ntz, matched_ts string"
    )
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on="k")


def test_null_right_value_propagates_with_its_own_row(spark):
    """A NULL in the matched right row's value column must surface as NULL,
    never resurrect an OLDER right row's value (pandas merge_asof parity).
    Regression: per-column last(ignorenulls) mixed columns across rows."""
    left = spark.createDataFrame([(1, _t(6))], "k int, ts timestamp_ntz")
    right = spark.createDataFrame(
        [(1, _t(1), 100, "old"), (1, _t(5), None, "new")],
        "k int, ts timestamp_ntz, rv int, tag string",
    )
    row = asof_join(left, right, on="k").collect()[0]
    assert row["matched_ts"] == _t(5)
    assert row["rv"] is None  # the matched row's own NULL, not 100
    assert row["tag"] == "new"


def test_single_shuffle_plan(frames):
    """The asof merge must cost ONE key shuffle (union -> one Exchange ->
    window), never a join of candidate pairs."""
    left, right = frames
    plan = (
        asof_join(left, right, on="k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


# ---- product quantization (kept here to avoid another JVM-session file) ----


def test_pq_encode_argmin_and_adc(spark):
    import numpy as np

    from palo_spark.operators.similarity import (
        pq_adc_lut,
        pq_codebooks,
        pq_encode,
        similarity_topk_pq,
    )

    cb = pq_codebooks(8, 2, 4, seed=3)
    rng = np.random.RandomState(11)
    vecs = [(i, [float(round(x, 3)) for x in rng.normal(0, 0.2, 8)]) for i in range(40)]
    df = spark.createDataFrame(vecs, "vec_id int, embedding array<float>")
    rows = df.select("vec_id", "embedding", pq_encode("embedding", cb).alias("codes")).collect()
    qd = lambda a, b: sum(
        int(np.floor((float(x) - float(y)) * (float(x) - float(y)) * 1e6))
        for x, y in zip(a, b)
    )
    for r in rows:
        v = [float(x) for x in r["embedding"]]
        for m, code in enumerate(r["codes"]):
            sub = v[m * 4 : (m + 1) * 4]
            dists = [qd(sub, c) for c in cb[m]]
            assert dists[code] == min(dists)  # argmin centroid chosen
    # ADC distance of the top hit == python-side replay
    q = vecs[0][1]
    lut = pq_adc_lut(q, cb)
    top = similarity_topk_pq(df, q, cb, k=40).collect()
    by_id = {r["vec_id"]: r["adc_dist"] for r in top}
    for r in rows:
        expect = sum(lut[m][c] for m, c in enumerate(r["codes"]))
        assert by_id[r["vec_id"]] == expect
    # scan-only plan: no Exchange before the TakeOrdered
    plan = (
        similarity_topk_pq(df, q, cb, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan and "Exchange hashpartitioning" not in plan


# ---- incremental dedup + BPE pair counts ----


def test_dedup_incremental_snapshot_semantics(spark):
    from palo_spark.operators.dedup import dedup_incremental, snapshot_fingerprints

    snap = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (10, "  ALPHA   beta "),  # normalizes to snapshot doc 1 -> dropped
            (11, "delta"),            # fresh
            (12, "delta"),            # intra-batch dup -> dropped (11 kept)
            (13, "epsilon"),          # fresh
        ],
        "doc_id long, text string",
    )
    out = dedup_incremental(batch, snapshot_fingerprints(snap))
    assert sorted(r["doc_id"] for r in out.collect()) == [11, 13]


def test_bpe_pair_counts_tiny(spark):
    from palo_spark.operators.text import bpe_pair_counts

    df = spark.createDataFrame(
        [(1, "ab ab abc"), (2, "bc a")], "doc_id long, text string"
    )
    # words >=2 chars: ab(x2), abc, bc -> pairs: a-b:3, b-c:2
    rows = bpe_pair_counts(df, top_n=10).collect()
    got = {(r["l"], r["r"]): r["cnt"] for r in rows}
    assert got == {("a", "b"): 3, ("b", "c"): 2}


def test_bpe_tokenize_vocab_merge_order(spark):
    from palo_spark.operators.text import bpe_tokenize_vocab

    df = spark.createDataFrame(
        [(1, "aaa cab the")], "doc_id long, text string"
    )
    # merges: rank1 (a,b), rank2 (c,ab), rank3 (a,a)
    out = {
        r["word"]: (list(r["toks"]), r["n_toks"])
        for r in bpe_tokenize_vocab(
            df, [("a", "b"), ("c", "ab"), ("a", "a")]
        ).collect()
    }
    assert out["aaa"] == (["aa", "a"], 2)      # leftmost merge, no re-overlap
    assert out["cab"] == (["cab"], 1)          # (a,b) first, then (c,ab)
    assert out["the"] == (["t", "h", "e"], 3)  # no learned pairs


def test_pq_encode_kernels_identical(spark):
    import numpy as np

    from palo_spark.operators.similarity import pq_codebooks, pq_encode

    cb = pq_codebooks(16, 4, 4, seed=9)
    rng = np.random.RandomState(21)
    rows = [(i, [float(x) for x in rng.normal(0, 0.3, 16)]) for i in range(60)]
    rows.append((99, None))  # NULL vector -> NULL codes, batch survives
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    a = {
        r["vec_id"]: r["c"]
        for r in df.select(
            "vec_id", pq_encode("embedding", cb, kernel="numpy").alias("c")
        ).collect()
    }
    b = {
        r["vec_id"]: r["c"]
        for r in df.filter("embedding IS NOT NULL")
        .select("vec_id", pq_encode("embedding", cb, kernel="native").alias("c"))
        .collect()
    }
    assert a[99] is None
    for k, v in b.items():
        assert list(a[k]) == list(v)


def test_bm25_matches_reference(spark):
    import math

    from palo_spark.operators.text import bm25_scores

    docs = [
        (1, "hash join hash join vector"),
        (2, "hash scan scan scan scan scan"),
        (3, "vector"),
        (4, "scan filter merge"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r["bm25_q"] for r in bm25_scores(df, ["hash", "vector"]).collect()}

    toks = {i: t.split() for i, t in docs}
    N = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / N
    dfreq = {
        t: sum(1 for v in toks.values() if t in v) for t in ("hash", "vector")
    }
    ref = {}
    for i, v in toks.items():
        s = 0
        for t in ("hash", "vector"):
            tf = v.count(t)
            if not tf:
                continue
            idf = math.log((N - dfreq[t] + 0.5) / (dfreq[t] + 0.5) + 1.0)
            s += int(
                math.floor(
                    idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len(v) / avgdl))
                    * 1e6
                )
            )
        if s:
            ref[i] = s
    assert got == ref
    assert max(got, key=got.get) == 1  # both terms, high tf -> top hit


def test_asof_matches_pandas_merge_asof(spark):
    """Cross-check against the de-facto reference implementation on a
    randomized fixture (both directions, with and without tolerance)."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(42)
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 5, 200),
            "ts": base + pd.to_timedelta(rng.randint(0, 10_000, 200), unit="s"),
            "lid": np.arange(200),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.randint(0, 5, 150),
            "ts": base + pd.to_timedelta(rng.randint(0, 10_000, 150), unit="s"),
            "rv": np.arange(150) * 10,
        }
    )
    # dedupe ties on (k, ts): keep max rv (same rule the operator asks of
    # callers; pandas keeps the LAST sorted row, so sort by rv)
    right = (
        right.sort_values(["k", "ts", "rv"]).drop_duplicates(["k", "ts"], keep="last")
    )
    l_df = spark.createDataFrame(left.assign(ts=left.ts.dt.to_pydatetime()),
                                 "k int, ts timestamp_ntz, lid long")
    r_df = spark.createDataFrame(right.assign(ts=right.ts.dt.to_pydatetime()),
                                 "k int, ts timestamp_ntz, rv long")

    for direction, tol in [("backward", None), ("forward", None),
                           ("backward", 600), ("forward", 600)]:
        got = {
            r["lid"]: r["rv"]
            for r in asof_join(
                l_df, r_df, on="k", direction=direction, tolerance=tol
            ).collect()
        }
        ref = pd.merge_asof(
            left.sort_values("ts"),
            right.sort_values("ts"),
            on="ts",
            by="k",
            direction=direction,
            tolerance=None if tol is None else pd.Timedelta(seconds=tol),
        )
        exp = {
            int(r.lid): (None if pd.isna(r.rv) else int(r.rv))
            for r in ref.itertuples()
        }
        assert got == exp, direction


def test_png_codec_all_filters():
    """decode_png must invert every scanline filter type, not just the
    filter-0 rows our encoder emits — build filtered streams by hand."""
    import struct
    import zlib

    import numpy as np

    from palo_spark.operators.multimodal import (
        _PNG_SIG,
        _png_chunk,
        decode_png,
        encode_png,
    )

    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, (5, 4, 3)).astype(np.uint8)
    # roundtrip through our own encoder (filter 0)
    assert (decode_png(encode_png(px)) == px).all()

    # hand-filter each row with types 1..4 and check recovery
    h, w, ch = px.shape
    stride = w * ch
    flat = px.reshape(h, stride).astype(int)
    raw = b""
    prev = np.zeros(stride, dtype=int)
    for y, ftype in zip(range(h), [1, 2, 3, 4, 1]):
        row = flat[y]
        filt = np.zeros(stride, dtype=int)
        for x in range(stride):
            a = row[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if ftype == 1:
                filt[x] = (row[x] - a) % 256
            elif ftype == 2:
                filt[x] = (row[x] - b) % 256
            elif ftype == 3:
                filt[x] = (row[x] - (a + b) // 2) % 256
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                filt[x] = (row[x] - pred) % 256
        raw += bytes([ftype]) + bytes(filt.astype(np.uint8))
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    assert (decode_png(png) == px).all()
