#!/usr/bin/env python
"""Measure per-file default-tier (non-slow) test durations.

Runs each tests/test_*.py in its own pytest process (JAX_PLATFORMS=cpu,
same env as tools/ci.sh), with a per-file cap, and writes a sorted
table to tools/ci_times.json. Used to decide which tests move behind
the `slow` marker so the default CI run fits the 30-minute budget
(VERDICT r3 next-round #7).

Usage: python tools/ci_times.py [--cap 420] [--only substr]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=420)
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out_path = os.path.join(REPO, "tools", "ci_times.json")
    results = {}
    if os.path.exists(out_path):
        results = json.load(open(out_path))

    files = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    for path in files:
        name = os.path.basename(path)
        if args.only and args.only not in name:
            continue
        t0 = time.monotonic()
        try:
            proc = subprocess.run(
                [sys.executable, "-m", "pytest", path, "-q", "-p", "no:cacheprovider"],
                cwd=REPO, env=env, capture_output=True, text=True,
                timeout=args.cap,
            )
            dt = time.monotonic() - t0
            tail = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
            results[name] = {"s": round(dt, 1), "rc": proc.returncode, "tail": tail}
        except subprocess.TimeoutExpired:
            results[name] = {"s": args.cap, "rc": -1, "tail": f"TIMEOUT >{args.cap}s"}
        json.dump(results, open(out_path, "w"), indent=1)
        print(f"{name:40s} {results[name]['s']:7.1f}s  {results[name]['tail']}", flush=True)

    total = sum(r["s"] for r in results.values())
    print(f"TOTAL {total:.0f}s over {len(results)} files")
    return 0


if __name__ == "__main__":
    sys.exit(main())
