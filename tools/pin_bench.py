#!/usr/bin/env python3
"""Regenerate bench_full_pins.json from a BENCH_FULL artifact.

Usage: python3 tools/pin_bench.py BENCH_FULL_rN.json > bench_full_pins.json

Reads the LAST JSON line carrying a "queries" map (the truncation-proof
medians_final line) and emits {query: median_sec} sorted by name. Run
after an intentional performance change so the >2x budget gate in
graft.Bench tracks the new expectation — always in the SAME commit as
the change it blesses.
"""
import sys, json

path = sys.argv[1]
last = None
with open(path) as f:
    for line in f:
        line = line.strip()
        if not line.startswith("{"):
            # sbt prefixes stdout with "[info] "
            idx = line.find("{")
            if idx < 0:
                continue
            line = line[idx:]
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(d, dict) and "queries" in d:
            last = d
if last is None:
    sys.exit(f"no JSON line with a 'queries' map in {path}")
pins = dict(sorted(last["queries"].items()))
print(json.dumps(pins, indent=1))
