#!/usr/bin/env python3
"""DuckDB half of the classifier knife-edge audit (see graft.ClfKnifeEdge).

Reads outDir/margins parquet — (stage, doc_id, m, e) where e is Spark's
(Java Math.exp) exp(-m), stages 1..rounds = GD rounds, 0 = scoring, -1 =
the 200k synthetic sweep — recomputes exp(-m) in DuckDB on the SAME
double bits, and reports:
  - fraction of inputs where the two exp values differ at all (ulp-level);
  - max |sigmoid_duck - sigmoid_java| — the worst cross-engine drift a
    margin can inject into a residual or score.
Combine with ClfKnifeEdge's min boundary distances: the replay is safe
iff every distance >= the max drift by a comfortable factor (the r*tf
gradient gate sees at most 1x the sigmoid drift since tf <= 1).

Usage: python3 tools/knife_edge.py <outDir>
"""
import sys, glob, json
import duckdb
import numpy as np

out = sys.argv[1]
files = glob.glob(f"{out}/margins/*.parquet")
assert files, f"no margins parquet under {out}"
con = duckdb.connect()
rows = con.sql(
    f"""SELECT stage, m, e AS e_java, exp(-m) AS e_duck
        FROM read_parquet({files!r})""").fetchnumpy()
m, ej, ed, stage = rows["m"], rows["e_java"], rows["e_duck"], rows["stage"]
sj, sd = 1.0 / (1.0 + ej), 1.0 / (1.0 + ed)
diff = ej != ed
drift = np.abs(sj - sd)
res = {
    "n": int(len(m)),
    "n_real": int((stage >= 0).sum()),
    "exp_differs_frac": float(diff.mean()),
    "exp_differs_frac_real": float(diff[stage >= 0].mean()),
    "max_sigmoid_drift": float(drift.max()),
    "max_sigmoid_drift_real": float(drift[stage >= 0].max()),
}
print(json.dumps(res))
