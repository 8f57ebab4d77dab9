"""Sketch column types: BITMAP and HLL as mergeable ``BinaryType``
columns (SURVEY.md §1.4, §2.4; upstream Doris ``BITMAP``/``HLL`` column
types, ``bitmap_union``/``hll_union_agg`` aggregate families).

Doris stores these as real column types so pre-aggregated tables stay
mergeable across loads; Spark has no such types, so the sketch is a
serialized ``binary`` value plus pandas-UDF aggregate/scalar functions:

- **BITMAP** — exact distinct-value sets. Serialization: magic +
  sorted ``int64`` array (``pyroaring`` is not in this environment, so
  this is the documented sorted-array "roaring-lite"; the format is
  versioned so a roaring codec can replace it without touching call
  sites). All set algebra is vectorized numpy on the sorted arrays.
- **HLL** — HyperLogLog, p=12 (4096 registers, ~1.6% rse), dense
  layout, register-wise-max merge. Values are hashed with
  ``blake2b-64`` — chosen because it is *process-stable* (Python's
  ``hash()`` is salted per process: an executor restart would silently
  change the sketch).

Scale notes: sketches exist precisely FOR the 100 TB path — a bitmap/
HLL column on an AGGREGATE-KEY table makes COUNT(DISTINCT) a
register-merge instead of a re-shuffle of raw values. The UDAFs here
are Arrow-batched GROUPED_AGG pandas UDFs: one hash shuffle on the
group key, partial merge per partition, O(sketch) state per group.
"""

from __future__ import annotations

import re
import struct
from hashlib import blake2b

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_BM_MAGIC = b"PSB1"  # palo_spark bitmap v1: sorted int64 array
_HLL_MAGIC = b"PSH1"  # palo_spark hll v1: p=12 dense registers

_HLL_P = 12
_HLL_M = 1 << _HLL_P


# ------------------------------------------------------------- bitmap core


def _bm_ser(arr: np.ndarray) -> bytes:
    return _BM_MAGIC + np.asarray(arr, dtype="<i8").tobytes()


def _bm_de(b) -> np.ndarray:
    if b is None:
        return np.empty(0, dtype="<i8")
    b = bytes(b)
    if b[:4] != _BM_MAGIC:
        raise ValueError("not a palo_spark bitmap value")
    return np.frombuffer(b, dtype="<i8", offset=4)


def bitmap_empty() -> bytes:
    return _bm_ser(np.empty(0, dtype="<i8"))


# ------------------------------------------------------- bitmap aggregates


def bitmap_union_of_values(col) -> Column:
    """Doris ``BITMAP_UNION(TO_BITMAP(c))``: aggregate raw integers into
    one bitmap (GROUPED_AGG pandas UDF; exact distinct set).

    .. warning:: Prefer :func:`bitmap_distinct_count` /
       :func:`grouped_bitmap_union_values` (salted two-level, the
       default convenience path since r5) unless the group is known
       tiny. Spark GROUPED_AGG pandas UDFs do **no map-side partial
       aggregation** — every raw value of a group is shipped to one
       Python worker. On a skewed hot key at scale, use
       :func:`grouped_bitmap_union_values` (the two-level salted form)
       instead; this Column form is for small/even group cardinalities.
    """

    @pandas_udf("binary")
    def agg(v: pd.Series) -> bytes:
        return _bm_ser(np.unique(v.dropna().to_numpy(dtype="int64")))

    return agg(F.col(col) if isinstance(col, str) else col)


def bitmap_union_of_bitmaps(col) -> Column:
    """Doris ``BITMAP_UNION(bitmap_col)``: merge pre-built bitmap values
    — the mergeable-sketch-column path an AGGREGATE-KEY table uses."""

    @pandas_udf("binary")
    def agg(v: pd.Series) -> bytes:
        parts = [_bm_de(b) for b in v if b is not None]
        if not parts:
            return bitmap_empty()
        return _bm_ser(np.unique(np.concatenate(parts)))

    return agg(F.col(col) if isinstance(col, str) else col)


def bitmap_intersect(col) -> Column:
    """Doris ``BITMAP_INTERSECT(bitmap_col)``: AND-merge the group's
    bitmaps (the audience-segmentation aggregate — "users in ALL
    segments"). Empty group → empty bitmap. Like the OR-merge forms,
    pre-aggregate per segment first (the orthogonal-bitmap pattern) so
    each Python worker only ANDs |segments| sketches, never raw rows."""

    @pandas_udf("binary")
    def agg(v: pd.Series) -> bytes:
        parts = [_bm_de(b) for b in v if b is not None]
        if not parts:
            return bitmap_empty()
        acc = parts[0]
        for p in parts[1:]:
            acc = np.intersect1d(acc, p)
        return _bm_ser(acc)

    return agg(F.col(col) if isinstance(col, str) else col)


# ---------------------------------------------------------- bitmap scalars


def to_bitmap(col) -> Column:
    """Doris ``TO_BITMAP(c)``: single-value bitmap per row."""

    @pandas_udf("binary")
    def f(v: pd.Series) -> pd.Series:
        return v.map(
            lambda x: bitmap_empty()
            if pd.isna(x)
            else _bm_ser(np.array([int(x)], dtype="<i8"))
        )

    return f(F.col(col) if isinstance(col, str) else col)


def _binary_scalar(op):
    @pandas_udf("binary")
    def f(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [_bm_ser(op(_bm_de(x), _bm_de(y))) for x, y in zip(a, b)]
        )

    return f


def bitmap_and(a, b) -> Column:
    return _binary_scalar(lambda x, y: np.intersect1d(x, y))(_c(a), _c(b))


def bitmap_or(a, b) -> Column:
    return _binary_scalar(lambda x, y: np.union1d(x, y))(_c(a), _c(b))


def bitmap_xor(a, b) -> Column:
    return _binary_scalar(lambda x, y: np.setxor1d(x, y))(_c(a), _c(b))


def bitmap_andnot(a, b) -> Column:
    return _binary_scalar(lambda x, y: np.setdiff1d(x, y))(_c(a), _c(b))


def bitmap_count(col) -> Column:
    @pandas_udf("bigint")
    def f(v: pd.Series) -> pd.Series:
        return v.map(lambda b: int(_bm_de(b).size))

    return f(_c(col))


def bitmap_contains(col, value: int) -> Column:
    @pandas_udf("boolean")
    def f(v: pd.Series) -> pd.Series:
        return v.map(lambda b: bool(np.isin(value, _bm_de(b))))

    return f(_c(col))


def bitmap_to_array(col) -> Column:
    """Doris ``BITMAP_TO_ARRAY`` — back to a sorted bigint array (feed
    to ``explode`` for Doris's ``explode_bitmap`` table function)."""

    @pandas_udf("array<bigint>")
    def f(v: pd.Series) -> pd.Series:
        return v.map(lambda b: _bm_de(b).tolist())

    return f(_c(col))


def bitmap_min(col) -> Column:
    """Doris ``BITMAP_MIN`` — smallest element, NULL for empty."""

    @pandas_udf("bigint")
    def f(v: pd.Series) -> pd.Series:
        return v.map(lambda b: (lambda a: int(a[0]) if a.size else None)(_bm_de(b)))

    return f(_c(col))


def bitmap_max(col) -> Column:
    """Doris ``BITMAP_MAX`` — largest element, NULL for empty."""

    @pandas_udf("bigint")
    def f(v: pd.Series) -> pd.Series:
        return v.map(lambda b: (lambda a: int(a[-1]) if a.size else None)(_bm_de(b)))

    return f(_c(col))


def bitmap_has_any(a, b) -> Column:
    """Doris ``BITMAP_HAS_ANY`` — do the two bitmaps intersect?"""

    @pandas_udf("boolean")
    def f(x: pd.Series, y: pd.Series) -> pd.Series:
        return pd.Series(
            [bool(np.intersect1d(_bm_de(p), _bm_de(q)).size) for p, q in zip(x, y)]
        )

    return f(_c(a), _c(b))


def bitmap_has_all(a, b) -> Column:
    """Doris ``BITMAP_HAS_ALL`` — is ``b`` a subset of ``a``? (empty b → true)"""

    @pandas_udf("boolean")
    def f(x: pd.Series, y: pd.Series) -> pd.Series:
        return pd.Series(
            [bool(np.isin(_bm_de(q), _bm_de(p)).all()) for p, q in zip(x, y)]
        )

    return f(_c(a), _c(b))


def sub_bitmap(col, offset: int, limit: int) -> Column:
    """Doris ``SUB_BITMAP(bm, offset, limit)`` — ``limit`` elements in
    ascending order starting at ``offset`` (negative offset counts from
    the end, MySQL substring convention)."""

    @pandas_udf("binary")
    def f(v: pd.Series) -> pd.Series:
        def one(b):
            a = _bm_de(b)
            start = offset if offset >= 0 else max(a.size + offset, 0)
            return _bm_ser(a[start : start + limit])

        return v.map(one)

    return f(_c(col))


def bitmap_subset_limit(col, range_start: int, limit: int) -> Column:
    """Doris ``BITMAP_SUBSET_LIMIT`` — up to ``limit`` elements with
    value ≥ ``range_start``."""

    @pandas_udf("binary")
    def f(v: pd.Series) -> pd.Series:
        def one(b):
            a = _bm_de(b)
            return _bm_ser(a[a >= range_start][:limit])

        return v.map(one)

    return f(_c(col))


def bitmap_subset_in_range(col, lo: int, hi: int) -> Column:
    """Doris ``BITMAP_SUBSET_IN_RANGE`` — elements in ``[lo, hi)``."""

    @pandas_udf("binary")
    def f(v: pd.Series) -> pd.Series:
        def one(b):
            a = _bm_de(b)
            return _bm_ser(a[(a >= lo) & (a < hi)])

        return v.map(one)

    return f(_c(col))


def _binary_count(op):
    @pandas_udf("bigint")
    def f(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [int(op(_bm_de(x), _bm_de(y)).size) for x, y in zip(a, b)]
        )

    return f


def bitmap_and_count(a, b) -> Column:
    return _binary_count(np.intersect1d)(_c(a), _c(b))


def bitmap_or_count(a, b) -> Column:
    return _binary_count(np.union1d)(_c(a), _c(b))


def bitmap_xor_count(a, b) -> Column:
    return _binary_count(np.setxor1d)(_c(a), _c(b))


def bitmap_andnot_count(a, b) -> Column:
    return _binary_count(np.setdiff1d)(_c(a), _c(b))


def bitmap_from_string(col) -> Column:
    """Doris ``BITMAP_FROM_STRING('1,2,3')``."""

    @pandas_udf("binary")
    def f(v: pd.Series) -> pd.Series:
        def parse(s):
            if s is None or s == "":
                return bitmap_empty()
            return _bm_ser(np.unique(np.array([int(x) for x in s.split(",")], dtype="<i8")))

        return v.map(parse)

    return f(_c(col))


def bitmap_to_string(col) -> Column:
    @pandas_udf("string")
    def f(v: pd.Series) -> pd.Series:
        return v.map(lambda b: ",".join(map(str, _bm_de(b).tolist())))

    return f(_c(col))


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


# ---------------------------------------------------------------- HLL core


def _hll_hash64(x) -> int:
    return struct.unpack(
        "<Q", blake2b(str(x).encode(), digest_size=8).digest()
    )[0]


def _hll_empty() -> np.ndarray:
    return np.zeros(_HLL_M, dtype=np.uint8)


def _hll_add(regs: np.ndarray, values) -> None:
    for x in values:
        h = _hll_hash64(x)
        idx = h & (_HLL_M - 1)
        w = h >> _HLL_P
        # rank = leading-position of first 1-bit in the remaining 52 bits
        rank = (64 - _HLL_P) - w.bit_length() + 1 if w else (64 - _HLL_P) + 1
        if rank > regs[idx]:
            regs[idx] = rank


def _hll_ser(regs: np.ndarray) -> bytes:
    return _HLL_MAGIC + regs.tobytes()


def _hll_de(b) -> np.ndarray:
    if b is None:
        return _hll_empty()
    b = bytes(b)
    if b[:4] != _HLL_MAGIC:
        raise ValueError("not a palo_spark hll value")
    return np.frombuffer(b, dtype=np.uint8, offset=4).copy()


def _hll_estimate(regs: np.ndarray) -> int:
    m = float(_HLL_M)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting for small n
    return int(round(est))


# ------------------------------------------------------ quantile state core

_QS_MAGIC = b"PSQ1"  # palo_spark quantile_state v1: t-digest-lite centroids
_QS_K = 256  # max centroids — rank error ~ 1/K per pass, ~2/K after merges


def _qs_compress(means: np.ndarray, weights: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Greedy size-capped clustering of (mean, weight) centroids sorted
    by mean — deterministic for a given input multiset; per-centroid
    weight ≤ ceil(total/K), so any quantile's rank error ≤ 1 centroid."""
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = float(weights.sum())
    cap = max(total / _QS_K, 1.0)
    out_m, out_w = [], []
    acc_m, acc_w = 0.0, 0.0
    for m, w in zip(means, weights):
        if acc_w and acc_w + w > cap:
            out_m.append(acc_m / acc_w)
            out_w.append(acc_w)
            acc_m, acc_w = 0.0, 0.0
        acc_m += m * w
        acc_w += w
    if acc_w:
        out_m.append(acc_m / acc_w)
        out_w.append(acc_w)
    return np.asarray(out_m, dtype="<f8"), np.asarray(out_w, dtype="<f8")


def _qs_ser(means: np.ndarray, weights: np.ndarray) -> bytes:
    n = means.size
    return _QS_MAGIC + struct.pack("<I", n) + means.tobytes() + weights.tobytes()


def _qs_de(b) -> tuple[np.ndarray, np.ndarray]:
    if b is None:
        return np.empty(0, dtype="<f8"), np.empty(0, dtype="<f8")
    b = bytes(b)
    if b[:4] != _QS_MAGIC:
        raise ValueError("not a palo_spark quantile_state value")
    (n,) = struct.unpack("<I", b[4:8])
    means = np.frombuffer(b, dtype="<f8", count=n, offset=8)
    weights = np.frombuffer(b, dtype="<f8", count=n, offset=8 + 8 * n)
    return means, weights


def _qs_quantile(means: np.ndarray, weights: np.ndarray, p: float) -> float:
    if means.size == 0:
        return float("nan")
    cum = np.cumsum(weights) - weights / 2.0
    target = p * float(weights.sum())
    return float(np.interp(target, cum, means))


# ------------------------------------------------- quantile state functions


def quantile_state_of_values(col) -> Column:
    """Doris ``TO_QUANTILE_STATE(c)`` aggregated: build one mergeable
    quantile sketch per group from raw values (t-digest-lite: ≤256
    weight-capped centroids, so the state is O(1) regardless of n)."""

    @pandas_udf("binary")
    def agg(v: pd.Series) -> bytes:
        vals = v.dropna().to_numpy(dtype="float64")
        m, w = _qs_compress(vals, np.ones_like(vals))
        return _qs_ser(m, w)

    return agg(_c(col))


def quantile_state_weighted(col, weight) -> Column:
    """Doris ``PERCENTILE_APPROX_WEIGHTED`` state: one mergeable
    quantile sketch per group where each value carries a weight (row
    multiplicity). Same centroid compression as the unweighted form —
    a weight-w value is exactly a w-fold repeat."""

    @pandas_udf("binary")
    def agg(v: pd.Series, w: pd.Series) -> bytes:
        mask = v.notna() & w.notna()
        vals = v[mask].to_numpy(dtype="float64")
        wts = w[mask].to_numpy(dtype="float64")
        keep = wts > 0
        m, cw = _qs_compress(vals[keep], wts[keep])
        return _qs_ser(m, cw)

    return agg(_c(col), _c(weight))


def quantile_union(col) -> Column:
    """Doris ``QUANTILE_UNION``: merge quantile states — concatenate
    centroid lists and re-compress (associative up to the documented
    ~2/K rank-error bound; load-order effects stay inside that bound)."""

    @pandas_udf("binary")
    def agg(v: pd.Series) -> bytes:
        parts = [_qs_de(b) for b in v if b is not None]
        if not parts:
            return _qs_ser(np.empty(0, dtype="<f8"), np.empty(0, dtype="<f8"))
        m = np.concatenate([p[0] for p in parts])
        w = np.concatenate([p[1] for p in parts])
        return _qs_ser(*_qs_compress(m, w))

    return agg(_c(col))


def quantile_percent(col, p: float) -> Column:
    """Doris ``QUANTILE_PERCENT(state, p)`` — interpolated quantile
    estimate from a quantile_state value."""

    @pandas_udf("double")
    def f(v: pd.Series) -> pd.Series:
        return v.map(lambda b: _qs_quantile(*_qs_de(b), p))

    return f(_c(col))


# ----------------------------------------------------------- HLL functions


def hll_hash(col) -> Column:
    """Doris ``HLL_HASH(c)``: per-row single-value HLL."""

    @pandas_udf("binary")
    def f(v: pd.Series) -> pd.Series:
        def one(x):
            regs = _hll_empty()
            if not pd.isna(x):
                _hll_add(regs, [x])
            return _hll_ser(regs)

        return v.map(one)

    return f(_c(col))


def hll_union_agg_values(col) -> Column:
    """``HLL_UNION_AGG`` over raw values: build one HLL per group.

    .. warning:: no map-side partials (GROUPED_AGG limitation) — for
       skewed keys at scale use :func:`grouped_hll_union_values`.
    """

    @pandas_udf("binary")
    def agg(v: pd.Series) -> bytes:
        regs = _hll_empty()
        _hll_add(regs, v.dropna().tolist())
        return _hll_ser(regs)

    return agg(_c(col))


def hll_union_agg(col) -> Column:
    """``HLL_UNION_AGG`` over HLL columns: register-wise max merge —
    the mergeable path (associative + commutative, load-order-free)."""

    @pandas_udf("binary")
    def agg(v: pd.Series) -> bytes:
        regs = _hll_empty()
        for b in v:
            if b is not None:
                np.maximum(regs, _hll_de(b), out=regs)
        return _hll_ser(regs)

    return agg(_c(col))


def hll_cardinality(col) -> Column:
    """Doris ``HLL_CARDINALITY`` — the NDV estimate of an HLL value."""

    @pandas_udf("bigint")
    def f(v: pd.Series) -> pd.Series:
        return v.map(lambda b: _hll_estimate(_hll_de(b)))

    return f(_c(col))


# ------------------------------------------ two-level (skew-safe) aggregates

_SALT_COL = "__sketch_salt"


def _grouped_two_level(df, group_cols, value_col, out_col, partial_agg, merge_agg,
                       salt_buckets: int):
    """Shared shape: salt on hash(value) → partial sketch per
    ``(keys..., salt)`` → merge sketches per ``keys``. Salting by the
    VALUE hash (not random) keeps the result deterministic and spreads a
    hot key across ``salt_buckets`` Python workers; the second stage
    merges at most ``salt_buckets`` O(sketch)-sized states per key."""
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    salted = df.withColumn(
        _SALT_COL, F.pmod(F.xxhash64(_c(value_col)), F.lit(salt_buckets))
    )
    partial = salted.groupBy(*group_cols, _SALT_COL).agg(
        partial_agg(value_col).alias(out_col)
    )
    return partial.groupBy(*group_cols).agg(merge_agg(out_col).alias(out_col))


def grouped_bitmap_union_values(df, group_cols, value_col, out_col="bm",
                                salt_buckets: int = 32):
    """Skew-safe ``BITMAP_UNION(TO_BITMAP(v)) GROUP BY keys`` — the form
    to use at 100 TB. :func:`bitmap_union_of_values` funnels every raw
    value of a group through one Python worker (GROUPED_AGG has no
    map-side combine); this two-level variant pre-aggregates per
    ``(keys, hash(v) % salt_buckets)`` so the hottest key is split
    across ``salt_buckets`` workers, then merges the (disjoint) partial
    bitmaps. Exact — identical output to the direct form (pytest-pinned).

    Returns a DataFrame ``keys..., out_col: binary``.
    """
    return _grouped_two_level(
        df, group_cols, value_col, out_col,
        bitmap_union_of_values, bitmap_union_of_bitmaps, salt_buckets,
    )


def bitmap_distinct_count(df, group_cols, value_col, out_col="ndv",
                          salt_buckets: int = 32):
    """Exact grouped NDV via bitmap — ``BITMAP_UNION_COUNT(TO_BITMAP(v))
    GROUP BY keys`` — routed through the salted two-level path BY
    DEFAULT (r4 verdict: the plain GROUPED_AGG convenience path has no
    map-side combine, so a hot key funnels all raw values through one
    Python worker; the salted form is identical output and the only
    shape that survives skew at 100 TB). ``salt_buckets=1`` degenerates
    to the direct single-level form for tiny inputs.

    Returns a DataFrame ``keys..., out_col: bigint``.
    """
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    if salt_buckets <= 1:
        bm = df.groupBy(*group_cols).agg(
            bitmap_union_of_values(value_col).alias("__bm")
        )
    else:
        bm = grouped_bitmap_union_values(
            df, group_cols, value_col, out_col="__bm", salt_buckets=salt_buckets
        )
    return bm.select(*group_cols, bitmap_count("__bm").alias(out_col))


def hll_distinct_count(df, group_cols, value_col, out_col="ndv",
                       salt_buckets: int = 32):
    """Approximate grouped NDV via HLL — ``HLL_UNION_AGG(HLL_HASH(v))
    GROUP BY keys`` — salted two-level by default (same rationale and
    bit-identical result as :func:`bitmap_distinct_count`; HLL merge is
    register-wise max, fully associative)."""
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    if salt_buckets <= 1:
        h = df.groupBy(*group_cols).agg(
            hll_union_agg_values(value_col).alias("__hll")
        )
    else:
        h = grouped_hll_union_values(
            df, group_cols, value_col, out_col="__hll", salt_buckets=salt_buckets
        )
    return h.select(*group_cols, hll_cardinality("__hll").alias(out_col))


def grouped_hll_union_values(df, group_cols, value_col, out_col="hll",
                             salt_buckets: int = 32):
    """Skew-safe ``HLL_UNION_AGG(HLL_HASH(v)) GROUP BY keys``. HLL merge
    is register-wise max — associative and commutative — so the salted
    two-level result is bit-identical to the direct form (pytest-pinned),
    while a hot key's raw values fan out over ``salt_buckets`` workers.

    Returns a DataFrame ``keys..., out_col: binary``.
    """
    return _grouped_two_level(
        df, group_cols, value_col, out_col,
        hll_union_agg_values, hll_union_agg, salt_buckets,
    )


# ---------------------------------------------- orthogonal expr calculate


def _parse_bitmap_expr(expr: str) -> list:
    """Parse Doris's ``orthogonal_bitmap_expr_calculate`` input string
    — tags combined with ``&`` ``|`` ``-`` ``^`` and parentheses — into
    RPN (shunting-yard; & binds tighter than | and -)."""
    toks = re.findall(r"[()&|^\-]|[^()&|^\-\s]+", expr)
    prec = {"&": 2, "^": 2, "-": 1, "|": 1}
    out: list = []
    ops: list = []
    for t in toks:
        if t == "(":
            ops.append(t)
        elif t == ")":
            while ops and ops[-1] != "(":
                out.append(ops.pop())
            if not ops:
                raise ValueError(f"unbalanced parens in {expr!r}")
            ops.pop()
        elif t in prec:
            while ops and ops[-1] != "(" and prec.get(ops[-1], 0) >= prec[t]:
                out.append(ops.pop())
            ops.append(t)
        else:
            out.append(("tag", t))
    while ops:
        if ops[-1] == "(":
            raise ValueError(f"unbalanced parens in {expr!r}")
        out.append(ops.pop())
    return out


def orthogonal_bitmap_expr_calculate(
    df, tag_col, value_col, expr: str, *, count_only: bool = False
):
    """Doris ``ORTHOGONAL_BITMAP_EXPR_CALCULATE(_COUNT)`` — audience
    algebra: build one exact bitmap per tag, then evaluate a boolean
    expression over the tag bitmaps, e.g. ``"(premium&mobile)|beta"``.

    Shape: one keyed two-phase bitmap aggregation per tag (the
    orthogonal part — each partition unions locally, merge is
    O(#tags × sketch)), then the expression combines a HANDFUL of
    per-tag bitmaps on a single row — the big fan-in never leaves the
    executors, matching Doris's BE-side orthogonal merge. Returns a
    1-row DataFrame with ``result_bitmap`` (or ``result_count``).
    """
    from pyspark.sql import functions as _F

    rpn = _parse_bitmap_expr(expr)
    tags = sorted({t[1] for t in rpn if isinstance(t, tuple)})
    per_tag = (
        df.filter(_c(tag_col).isin(tags))
        .select(_c(tag_col).alias("__tag"), _c(value_col).alias("__v"))
        .groupBy("__tag")
        .agg(bitmap_union_of_values(_F.col("__v")).alias("__bm"))
    )
    # pivot the few tag bitmaps onto one row (first() per tag)
    row = per_tag.groupBy().pivot("__tag", tags).agg(_F.first("__bm"))
    empty = _F.lit(bitmap_empty())
    stack: list = []
    for t in rpn:
        if isinstance(t, tuple):
            stack.append(_F.coalesce(_F.col(f"`{t[1]}`"), empty))
        else:
            b = stack.pop()
            a = stack.pop()
            op = {"&": bitmap_and, "|": bitmap_or, "^": bitmap_xor,
                  "-": bitmap_andnot}[t]
            stack.append(op(a, b))
    if len(stack) != 1:
        raise ValueError(f"malformed expression {expr!r}")
    res = stack[0]
    if count_only:
        return row.select(bitmap_count(res).alias("result_count"))
    return row.select(res.alias("result_bitmap"))


def bitmap_hash(col) -> Column:
    """Doris ``BITMAP_HASH(expr)`` — single-element bitmap of the
    32-bit murmur-ish hash of the value; composes with bitmap_union to
    count distinct over arbitrary (non-integer) inputs."""
    return to_bitmap(F.abs(F.hash(_c(col))).cast("long"))


def orthogonal_bitmap_union_count(col) -> Column:
    """Doris ``ORTHOGONAL_BITMAP_UNION_COUNT(bitmap_col)`` — union the
    per-partition (orthogonal) bitmaps and count. Composition of the
    existing mergeable pieces: union-of-bitmaps then cardinality."""
    return bitmap_count_from(bitmap_union_of_bitmaps(_c(col)))


def bitmap_count_from(bm_col) -> Column:
    """Cardinality of a bitmap-typed Column expression (helper: Doris
    ``BITMAP_COUNT`` accepts any bitmap expression, not just a stored
    column)."""

    @pandas_udf("long")
    def f(v: pd.Series) -> pd.Series:
        return v.map(lambda b: 0 if b is None else len(_bm_de(b)))

    return f(bm_col)
