#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]

Reads outDir/<name>/ parquet (written by graft.Verify) and
outDir/oracle_sql.json, runs each oracle SQL in DuckDB over the sfDir
parquet tables, and compares: columns sorted by name, rows sorted by all
columns, exact value match (floats: exact, with a reported max-abs-diff
when they differ so rounding bugs are diagnosable).
"""
import sys, json, glob, math
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            try:
                df[c] = df[c].dt.tz_localize(None)
            except TypeError:
                pass
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)


def compare(name, got: pd.DataFrame, exp: pd.DataFrame):
    problems = []
    if sorted(got.columns) != sorted(exp.columns):
        return [f"columns differ: spark={sorted(got.columns)} oracle={sorted(exp.columns)}"]
    g, e = canon(got), canon(exp)
    if len(g) != len(e):
        return [f"row count differs: spark={len(g)} oracle={len(e)}"]
    for c in g.columns:
        if str(g[c].dtype) != str(e[c].dtype):
            problems.append(
                f"col {c}: dtype differs spark={g[c].dtype} oracle={e[c].dtype}")
    if problems:
        return problems
    for c in g.columns:
        gv, ev = g[c], e[c]
        if pd.api.types.is_float_dtype(gv) or pd.api.types.is_float_dtype(ev):
            ga = gv.astype(float).to_numpy()
            ea = ev.astype(float).to_numpy()
            both_nan = np.isnan(ga) & np.isnan(ea)
            eq = (ga == ea) | both_nan
            if not eq.all():
                d = np.nanmax(np.abs(ga - ea))
                problems.append(f"col {c}: {np.count_nonzero(~eq)} float mismatches, max abs diff {d:.3e}")
        else:
            gn = gv.isna()
            en = ev.isna()
            eq = (gn & en) | (gv.fillna(0) == ev.fillna(0) if not gv.dtype == object
                              else gv.fillna("\0") == ev.fillna("\0"))
            if not eq.all():
                idx = np.flatnonzero(~eq.to_numpy())[:3]
                samples = [(gv.iloc[i], ev.iloc[i]) for i in idx]
                problems.append(f"col {c}: {np.count_nonzero(~eq.to_numpy())} mismatches, e.g. spark vs oracle {samples}")
    return problems


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output found")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").df()
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle SQL error: {ex}")
            n_fail += 1
            continue
        problems = compare(name, got, exp)
        if problems:
            n_fail += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows)")
    # queries without oracle: rows-only
    import os
    for d in sorted(glob.glob(f"{out}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name in oracle:
            continue
        files = glob.glob(f"{d}/*.parquet")
        if files:
            n = con.execute(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0]
            print(f"ROWS {name}: {n} rows (no oracle)")
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
