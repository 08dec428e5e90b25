#!/usr/bin/env python3
"""Local oracle check mirroring the driver: run graft.Verify first, then
compare each <out>/<name> parquet against DuckDB running oracle_sql.json.

Usage: python3 tools/check.py [sfDir] [outDir] [query ...]
"""
import json
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            sdf = pd.read_parquet(f"{out}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        try:
            ddf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        ok, msg = compare(sdf, ddf)
        if ok:
            print(f"PASS {name} ({len(sdf)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: {msg}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


def normalize(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s
        elif s.dtype == object:
            # dates come back as datetime.date from duckdb, Timestamp bits from parquet
            df[c] = s.apply(lambda v: str(v) if v is not None else None)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(sdf, ddf):
    if sorted(sdf.columns) != sorted(ddf.columns):
        return False, f"columns differ: spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}"
    if len(sdf) != len(ddf):
        return False, f"row count differs: spark={len(sdf)} duck={len(ddf)}"
    a, b = normalize(sdf), normalize(ddf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = av.astype("float64")
            bv = bv.astype("float64")
            na, nb = av.isna(), bv.isna()
            if not na.equals(nb):
                return False, f"col {c}: null mask differs"
            x, y = av[~na].values, bv[~nb].values
            if len(x) and not np.array_equal(x, y):
                d = np.max(np.abs(x - y))
                bad = int(np.sum(x != y))
                return False, f"col {c}: {bad} values differ, max abs diff {d:.3e}"
        else:
            if not av.equals(bv):
                diff = (av != bv) & ~(av.isna() & bv.isna())
                i = diff.idxmax()
                return False, f"col {c}: differs at row {i}: spark={av[i]!r} duck={bv[i]!r}"
    return True, ""


if __name__ == "__main__":
    main()
