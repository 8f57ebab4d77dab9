"""Seeded randomized closure of the r10c3 SQL function surface: each
family is checked against an INDEPENDENT Python reference over random
inputs (one batched SELECT per family, so the whole battery costs a
handful of Spark jobs). Fixed-case pins live in test_sql_frontend.py;
this file guards the edges those cases can't enumerate."""

import datetime as dt
import itertools
import math
import random

from palo_spark.sql_frontend import doris_sql


def _one_row(spark, exprs):
    """Evaluate many scalar expressions in one job; returns the row."""
    return doris_sql(spark, "SELECT " + ", ".join(
        f"{e} AS c{i}" for i, e in enumerate(exprs)
    )).collect()[0]


def test_bitmap_algebra_random(spark):
    rng = random.Random(61)
    exprs, want = [], []
    for _ in range(25):
        a = sorted({rng.randint(0, 30) for _ in range(rng.randint(0, 12))})
        b = sorted({rng.randint(0, 30) for _ in range(rng.randint(0, 12))})
        sa = ",".join(map(str, a)) or "0"
        sb = ",".join(map(str, b)) or "0"
        A, B = set(a or [0]), set(b or [0])
        fa = f"bitmap_from_string('{sa}')"
        fb = f"bitmap_from_string('{sb}')"
        exprs += [
            f"bitmap_to_string(bitmap_and({fa}, {fb}))",
            f"bitmap_to_string(bitmap_or({fa}, {fb}))",
            f"bitmap_to_string(bitmap_xor({fa}, {fb}))",
            f"bitmap_to_string(bitmap_andnot({fa}, {fb}))",
            f"bitmap_or_count({fa}, {fb})",
        ]
        want += [
            ",".join(map(str, sorted(A & B))),
            ",".join(map(str, sorted(A | B))),
            ",".join(map(str, sorted(A ^ B))),
            ",".join(map(str, sorted(A - B))),
            len(A | B),
        ]
    row = _one_row(spark, exprs)
    for i, w in enumerate(want):
        assert row[i] == w, (i, exprs[i], row[i], w)


def test_array_range_cum_sum_random(spark):
    rng = random.Random(62)
    exprs, want = [], []
    for _ in range(30):
        s = rng.randint(-5, 8)
        e = rng.randint(-5, 12)
        st = rng.randint(1, 4)
        exprs.append(f"array_join(array_range({s}, {e}, {st}), ',')")
        want.append(",".join(map(str, range(s, e, st))))
        vals = [rng.randint(-9, 9) for _ in range(rng.randint(0, 6))]
        lit = (
            "CAST(array() AS ARRAY<BIGINT>)"
            if not vals
            else "ARRAY(" + ",".join(map(str, vals)) + ")"
        )
        exprs.append(f"array_join(array_cum_sum({lit}), ',')")
        want.append(",".join(map(str, itertools.accumulate(vals))))
    row = _one_row(spark, exprs)
    for i, w in enumerate(want):
        assert row[i] == w, (i, exprs[i], row[i], w)


def test_truncate_and_fmod_random(spark):
    rng = random.Random(63)
    exprs, want = [], []
    for _ in range(30):
        x = round(rng.uniform(-500, 500), 4)
        d = rng.randint(0, 3)
        exprs.append(f"truncate(CAST({x!r} AS DOUBLE), {d})")
        want.append(math.trunc(x * 10**d) / 10**d)
        a = round(rng.uniform(0.5, 50), 3)
        b = round(rng.uniform(0.5, 9), 3)
        exprs.append(f"fmod(CAST({a!r} AS DOUBLE), CAST({b!r} AS DOUBLE))")
        want.append(math.fmod(a, b))
    row = _one_row(spark, exprs)
    for i, w in enumerate(want):
        assert abs(row[i] - w) < 1e-9, (i, exprs[i], row[i], w)


def _week0_ref(d: dt.date) -> int:
    """Independent MySQL WEEK(d, 0) reference: Sunday-start weeks
    numbered from the year's first Sunday."""
    jan1 = d.replace(month=1, day=1)
    # days until the first Sunday (Python: Monday=0 .. Sunday=6)
    off = (6 - jan1.weekday()) % 7
    first_sunday = jan1 + dt.timedelta(days=off)
    if d < first_sunday:
        return 0
    return (d - first_sunday).days // 7 + 1


def test_week_yearweek_random_dates(spark):
    rng = random.Random(64)
    dates = [
        dt.date(2020, 1, 1) + dt.timedelta(days=rng.randint(0, 2500))
        for _ in range(40)
    ]
    # year boundaries are the risky region — force a few
    dates += [dt.date(y, m, dd) for y in (2023, 2024)
              for m, dd in ((1, 1), (1, 6), (12, 31))]
    exprs = []
    for d in dates:
        exprs.append(f"week('{d}')")
        exprs.append(f"yearweek('{d}')")
    row = _one_row(spark, exprs)
    for i, d in enumerate(dates):
        w0 = _week0_ref(d)
        assert row[2 * i] == w0, (d, row[2 * i], w0)
        if w0 == 0:
            yw = (d.year - 1) * 100 + _week0_ref(dt.date(d.year - 1, 12, 31))
        else:
            yw = d.year * 100 + w0
        assert row[2 * i + 1] == yw, (d, row[2 * i + 1], yw)


def test_json_object_extract_roundtrip_random(spark):
    rng = random.Random(65)
    exprs, want = [], []
    for _ in range(20):
        k = "k" + str(rng.randint(0, 99))
        if rng.random() < 0.5:
            v = rng.randint(-1000, 1000)
            exprs.append(
                f"json_extract_int(json_object('{k}', {v}), '$.{k}')"
            )
            want.append(v)
        else:
            v = "v" + str(rng.randint(0, 999))
            exprs.append(
                f"json_extract_string(json_object('{k}', '{v}'), '$.{k}')"
            )
            want.append(v)
    row = _one_row(spark, exprs)
    for i, w in enumerate(want):
        assert row[i] == w, (i, exprs[i], row[i], w)


def test_date_floor_ceil_random(spark):
    """floor <= d < floor + period; ceil - period < d <= ceil; both on
    the origin-anchored grid (multiples of the period since year 1)."""
    rng = random.Random(66)
    units = {"HOUR": 3600, "MINUTE": 60, "SECOND": 1, "DAY": 86400}
    cases = []
    exprs = []
    for _ in range(25):
        unit = rng.choice(list(units))
        p = rng.choice([1, 2, 3, 5, 7, 12])
        d = dt.datetime(2024, 1, 1) + dt.timedelta(
            seconds=rng.randint(0, 20_000_000)
        )
        cases.append((unit, p, d))
        exprs.append(f"{unit.lower()}_floor('{d}', {p})")
        exprs.append(f"{unit.lower()}_ceil('{d}', {p})")
    row = _one_row(spark, exprs)
    origin = dt.datetime(1, 1, 1)
    for i, (unit, p, d) in enumerate(cases):
        fl, ce = row[2 * i], row[2 * i + 1]
        step = dt.timedelta(seconds=units[unit] * p)
        assert fl <= d < fl + step, (unit, p, d, fl)
        assert ce - step < d <= ce, (unit, p, d, ce)
        # grid anchoring: whole periods since the origin
        assert ((fl - origin).total_seconds() % (units[unit] * p)) == 0
