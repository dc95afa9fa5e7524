#!/usr/bin/env python3
"""Partition-independence check: two Verify output dirs (e.g. produced with
different SPARK_GRAFT_CPUS) must contain byte-equal result sets for every
query. Usage: python3 tools/determinism.py /tmp/out_a /tmp/out_b
"""
import sys, glob, os
import duckdb

a_dir, b_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
bad = 0
names = sorted(os.path.basename(d.rstrip("/")) for d in glob.glob(f"{a_dir}/*/"))
for name in names:
    other = f"{b_dir}/{name}"
    if not os.path.isdir(other):
        print("MISSING", name); bad += 1; continue
    a = con.execute(f"SELECT * FROM read_parquet('{a_dir}/{name}/*.parquet')").df()
    b = con.execute(f"SELECT * FROM read_parquet('{other}/*.parquet')").df()
    cols = sorted(a.columns)
    a = a[cols].sort_values(by=cols, na_position="first").reset_index(drop=True)
    b = b[cols].sort_values(by=cols, na_position="first").reset_index(drop=True)
    if not a.equals(b):
        print("DIFF", name, len(a), len(b)); bad += 1
print("FAIL" if bad else f"PASS ({len(names)} queries identical)")
sys.exit(1 if bad else 0)
