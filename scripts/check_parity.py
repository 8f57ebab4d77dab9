#!/usr/bin/env python
"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()[name]`` on Spark and ``oracle_sql()[name]`` on
DuckDB over the same parquet fixtures; compares row count, sorted column
names, and order-insensitive cell values (floats bit-exact, with a
tolerance fallback reported separately so float-noise is distinguishable
from real bugs).

Usage: python scripts/check_parity.py [--sf /root/testdata/sf0.01] [name-substr ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402


def norm_cell(v):
    if v is None:
        return ("∅",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", repr(v))
    if isinstance(v, (int,)):
        return ("i", int(v))
    if isinstance(v, pd.Timestamp):
        return ("t", v.isoformat())
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return ("a", tuple(norm_cell(x) for x in v))
    if isinstance(v, (bytes, bytearray)):
        return ("b", bytes(v).hex())
    return ("s", str(v))


def normalize(pdf: pd.DataFrame):
    pdf = pdf.copy()
    # pandas nullable ints/objects: normalize NaN/NaT to None
    pdf = pdf.astype(object).where(pd.notnull(pdf), None)
    cols = sorted(pdf.columns)
    rows = [tuple(norm_cell(v) for v in row) for row in pdf[cols].itertuples(index=False)]
    rows.sort()
    return list(cols), rows


def approx_equal(r1, r2, rel=1e-9):
    if len(r1) != len(r2):
        return False
    for a, b in zip(r1, r2):
        if a == b:
            continue
        if a[0] == "f" and b[0] == "f":
            x, y = float(a[1]), float(b[1])
            if math.isclose(x, y, rel_tol=rel, abs_tol=1e-9):
                continue
        if a[0] == "a" and b[0] == "a" and approx_equal(a[1], b[1], rel):
            continue
        return False
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("patterns", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as ent
    from palo_spark.session import get_session
    from palo_spark.catalog import TABLES

    qs = ent.queries()
    oracles = ent.oracle_sql()
    names = [
        n for n in qs
        if not args.patterns or any(p in n for p in args.patterns)
    ]

    spark = get_session("parity-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    n_pass = n_float = n_fail = n_err = n_rowsonly = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            spdf = sdf.toPandas()
        except Exception:
            print(f"ERROR  {name} (spark)\n{traceback.format_exc()}")
            n_err += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(spdf)} rows [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            opdf = con.execute(oracles[name]).df()
        except Exception:
            print(f"ERROR  {name} (duckdb)\n{traceback.format_exc()}")
            n_err += 1
            continue
        scols, srows = normalize(spdf)
        ocols, orows = normalize(opdf)
        dt = time.time() - t0
        if scols != ocols:
            print(f"FAIL   {name}: columns differ spark={scols} oracle={ocols}")
            n_fail += 1
        elif len(srows) != len(orows):
            print(f"FAIL   {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
        elif srows == orows:
            print(f"PASS   {name}: {len(srows)} rows [{dt:.1f}s]")
            n_pass += 1
        else:
            # exact mismatch — is it float-noise-only?
            fuzzy = all(approx_equal(a, b) for a, b in zip(srows, orows))
            if fuzzy:
                print(f"FLOAT~ {name}: {len(srows)} rows match only within 1e-9 — "
                      f"tighten determinism [{dt:.1f}s]")
                n_float += 1
            else:
                bad = [
                    (a, b) for a, b in zip(srows, orows) if a != b
                ][:3]
                print(f"FAIL   {name}: values differ; first diffs:")
                for a, b in bad:
                    print(f"    spark : {a}\n    oracle: {b}")
                n_fail += 1

    print(
        f"\n== {n_pass} pass, {n_float} float-only, {n_fail} fail, "
        f"{n_err} error, {n_rowsonly} rows-only, of {len(names)} =="
    )
    spark.stop()
    sys.exit(1 if (n_fail or n_err) else 0)


if __name__ == "__main__":
    main()
