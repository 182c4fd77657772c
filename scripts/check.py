#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py [verify_out_dir] [sf_dir]

Reads each <out>/<query>/ parquet dump written by graft.Verify, runs the
matching SQL from oracle_sql.json in DuckDB over the same parquet tables,
and compares: columns sorted by name, rows sorted by all columns, values
compared exactly (plus a loose float fallback report so near-misses are
distinguishable from hard mismatches).
"""
import glob
import json
import math
import struct
import sys

import duckdb
import pandas as pd

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def cell_eq(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) or pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        # Bit-exact, matching the driver's hash gate: -0.0 != +0.0 here
        # even though Python's `==` says they're equal (r8 feature_woe_encode
        # shipped red because the old `fa == fb` was blind to signed zeros).
        return struct.pack(">d", fa) == struct.pack(">d", fb)
    return str(a) == str(b)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame):
    got, want = canon(got), canon(want)
    if list(got.columns) != list(want.columns):
        return f"COLUMNS got={list(got.columns)} want={list(want.columns)}"
    if len(got) != len(want):
        return f"ROWS got={len(got)} want={len(want)}"
    n_bad = 0
    example = None
    for c in got.columns:
        gv, wv = got[c].tolist(), want[c].tolist()
        for i, (a, b) in enumerate(zip(gv, wv)):
            if not cell_eq(a, b):
                n_bad += 1
                if example is None:
                    example = f"col={c} row={i} got={a!r} want={b!r}"
    if n_bad:
        return f"VALUES {n_bad} mismatched cells; first: {example}"
    return None


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    with open(f"{OUT}/oracle_sql.json") as fh:
        oracle = json.load(fh)

    dumped = {p.rstrip("/").split("/")[-1]
              for p in glob.glob(f"{OUT}/*/")}
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if name not in dumped:
            print(f"MISSING-DUMP {name}")
            n_fail += 1
            continue
        files = glob.glob(f"{OUT}/{name}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True) \
            if files else pd.DataFrame()
        try:
            want = con.execute(oracle[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"ORACLE-ERROR {name}: {e}")
            n_fail += 1
            continue
        err = compare(name, got, want)
        if err:
            print(f"FAIL {name}: {err}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    rows_only = dumped - set(oracle)
    for name in sorted(rows_only):
        files = glob.glob(f"{OUT}/{name}/*.parquet")
        n = sum(len(pd.read_parquet(f)) for f in files)
        print(f"ROWS-ONLY {name}: {n} rows")
    print(f"\n{n_pass} pass, {n_fail} fail, {len(rows_only)} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
