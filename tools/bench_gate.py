#!/usr/bin/env python
"""No-regression gate for the headline benchmark.

Runs `bench.py` on the real chip, compares against the best previously
recorded number (the max over `BENCH_r*.json` plus any locally recorded
`tools/bench_last.json`), and FAILS if the new number regresses by more
than 10%. On pass it records the run in `tools/bench_last.json` so later
gate runs compare against the freshest local measurement.

Run this before landing ANY commit that touches the prover path, and put
the printed number in the commit message. (Instituted after the r02->r03
3x regression shipped unmeasured — VERDICT r3 "weak" #1.)

Usage: python tools/bench_gate.py [--tolerance 0.10]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def best_recorded() -> tuple[float, str]:
    """Max perms/s over driver rounds + the local gate record."""
    best, src = 0.0, "(none)"
    for path in glob.glob(os.path.join(REPO, "BENCH_r*.json")):
        try:
            rec = json.load(open(path))
            v = float(rec["parsed"]["value"])
        except Exception:
            continue
        if v > best:
            best, src = v, os.path.basename(path)
    local = os.path.join(REPO, "tools", "bench_last.json")
    if os.path.exists(local):
        try:
            rec = json.load(open(local))
            v = float(rec["value"])
            if v > best:
                best, src = v, "tools/bench_last.json"
        except Exception:
            pass
    return best, src


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tolerance", type=float, default=0.10)
    args = ap.parse_args()

    best, src = best_recorded()
    print(f"gate: best recorded = {best:,.0f} perms/s ({src})")

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=1800,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if out.returncode != 0 or not line:
        print(out.stdout[-2000:])
        print(out.stderr[-2000:])
        print("gate: FAIL — bench.py did not produce a result")
        return 1
    rec = json.loads(line[-1])
    value = float(rec["value"])
    print(f"gate: measured = {value:,.0f} {rec['unit']} ({rec['metric']})")

    if best > 0 and value < best * (1.0 - args.tolerance):
        print(
            f"gate: FAIL — {value:,.0f} is more than "
            f"{args.tolerance:.0%} below {best:,.0f} ({src})"
        )
        return 1

    with open(os.path.join(REPO, "tools", "bench_last.json"), "w") as f:
        json.dump(rec, f, indent=1)
    print("gate: PASS (recorded in tools/bench_last.json)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
