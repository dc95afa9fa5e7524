#!/usr/bin/env python3
"""Repo-owned leak scan with verifiable metadata (ADVICE r9: the driver's
LEAKCHECK.json carries only a round number, so a clean scan is
indistinguishable from a hand-edited round bump — this scanner records
commit, file count, and timestamp so each result is independently
reproducible: check out the commit, rerun, diff).

Scans src/ and build.sbt for the same categories the driver checks:
internal package imports, internal URLs/hosts, bucket names, Slack
links, API-key-shaped strings, and internal env vars.

Usage: python3 tools/leakcheck.py [> LEAKCHECK_LOCAL.json]
"""
import json
import re
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

PATTERNS = {
    # public-knowledge-only contract: nothing may reference private infra
    "internal-import": r"^\s*import\s+(?!org\.apache|java|javax|scala|graft\b)[a-z_]+\.(internal|corp|private)",
    "internal-url": r"https?://[a-z0-9.-]*\.(corp|internal|intra)[a-z0-9./-]*",
    "internal-bucket": r"s3a?://(?!example|test|bucket\b)[a-z0-9-]*(internal|corp|prod)[a-z0-9-]*",
    "slack-link": r"slack\.com/archives|app\.slack\.com",
    "api-key": r"(sk|pk|rk)-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16}",
    "env-secret": r"os\.environ\[.(AWS_SECRET|.*_TOKEN|.*_API_KEY)",
}


def scan():
    files = sorted(
        p for p in ROOT.glob("src/**/*.scala") if p.is_file()
    ) + [ROOT / "build.sbt"]
    hits = {k: [] for k in PATTERNS}
    for f in files:
        text = f.read_text(errors="replace")
        for name, pat in PATTERNS.items():
            for m in re.finditer(pat, text, re.MULTILINE):
                line = text[: m.start()].count("\n") + 1
                hits[name].append(f"{f.relative_to(ROOT)}:{line}")
    return files, hits


def main():
    files, hits = scan()
    commit = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=ROOT, capture_output=True, text=True
    ).stdout.strip()
    out = {
        "commit": commit,
        "scanned_files": len(files),
        "timestamp_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "tool": "tools/leakcheck.py",
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    json.dump(out, sys.stdout, indent=2)
    print()
    return 1 if out["n_hits"] else 0


if __name__ == "__main__":
    sys.exit(main())
