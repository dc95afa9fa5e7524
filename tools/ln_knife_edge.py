#!/usr/bin/env python3
"""DuckDB half of the unigram-LM knife-edge audit (see
graft.UnigramKnifeEdge).

Part A — drift census: reads outDir/ln_inputs parquet (stage, v,
ln_java), recomputes ln(v) in DuckDB on the same doubles, and counts
differing values. (Measured: a handful DO differ at the last ulp, so
"zero drift" is NOT the safety argument.)

Part B — full cross-engine DP replay: reads outDir/round_tables
(stage, piece, cnt — the three log-prob tables' inputs) and
outDir/segs (stage, w, pieces — the segmentation Spark's DP actually
produced per round), rebuilds each round's log-probs with DUCKDB's ln
values, replays the Viterbi DP (same smallest-backpointer tie-break)
in those drifted numbers, and asserts every word's segmentation is
IDENTICAL. This is the decisive check: if the drifted-ln DP reproduces
every segmentation — exact ties included — the oracle's arithmetic
agreement is proven, not lucky. Combine with the margin numbers
UnigramKnifeEdge prints (min nonzero margin vs the ~2.8e-14 worst
path-drift bound) for the quantitative story.

Usage: python3 tools/ln_knife_edge.py <outDir>  (exit 0 = all safe)
"""
import sys, glob, json
import duckdb
import numpy as np
import pandas as pd

out = sys.argv[1]
MAXL, UNK = 4, -1e9

f_ln = glob.glob(f"{out}/ln_inputs/*.parquet")
f_rt = glob.glob(f"{out}/round_tables/*.parquet")
f_sg = glob.glob(f"{out}/segs/*.parquet")
assert f_ln and f_rt and f_sg, f"missing audit parquet under {out}"

rows = duckdb.sql(
    f"SELECT stage, v, ln_java, ln(v) AS ln_duck FROM read_parquet({f_ln!r})"
).fetchnumpy()
diff = rows["ln_java"] != rows["ln_duck"]

def duck_ln(values):
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"v": values}))
    return con.sql("SELECT ln(v) FROM t").fetchnumpy()["ln(v)"]

def viterbi(w, lp):
    n = len(w)
    best = [0.0] * (n + 1)
    bp = [0] * (n + 1)
    for i in range(1, n + 1):
        bs, bj = None, -1
        for j in range(max(0, i - MAXL), i):
            piece = w[j:i]
            if i - j == 1:
                s = best[j] + lp.get(piece, UNK)
            elif piece in lp:
                s = best[j] + lp[piece]
            else:
                continue
            if bj < 0 or s > bs:  # ties keep smallest j
                bs, bj = s, j
        best[i], bp[i] = bs, bj
    ps, pos = [], n
    while pos > 0:
        ps.insert(0, w[bp[pos]:pos])
        pos = bp[pos]
    return ps

rt = pd.read_parquet(f_rt[0])
sg = pd.read_parquet(f_sg[0])
seg_mismatch = 0
for stage in sorted(rt["stage"].unique()):
    tbl = rt[rt["stage"] == stage]
    cnts = tbl["cnt"].to_numpy().astype(np.float64)
    tot = np.float64(tbl["cnt"].sum())
    lns = duck_ln(np.concatenate([cnts, [tot]]))
    lp = dict(zip(tbl["piece"], lns[:-1] - lns[-1]))
    want = sg[sg["stage"] == stage]
    for w, pieces in zip(want["w"], want["pieces"]):
        got = " ".join(viterbi(w, lp))
        if got != pieces:
            seg_mismatch += 1
            if seg_mismatch <= 5:
                print(f"MISMATCH stage {stage} word {w!r}: "
                      f"duck {got!r} vs spark {pieces!r}", file=sys.stderr)

res = {
    "n_ln_inputs": int(len(diff)),
    "ln_differs": int(diff.sum()),
    "max_abs_ln_diff": float(np.abs(rows["ln_java"] - rows["ln_duck"]).max()),
    "dp_words_checked": int(len(sg)),
    "dp_seg_mismatches": int(seg_mismatch),
}
print(json.dumps(res))
sys.exit(0 if seg_mismatch == 0 else 1)
