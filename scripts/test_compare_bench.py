#!/usr/bin/env python3
"""Controls for compare_bench.py's self-adjudication (VERDICT r12 #7).

The r11/r12 machinery proves a STALL self-clears (isolated warm rep back
inside the gate), but nothing proved a REAL regression still flips rc —
an adjudicator that clears everything is a disabled gate. This harness
runs compare_bench.py end-to-end against synthetic artifacts:

 1. NEGATIVE control: `slow_probe` (a graft.Profile case that sleeps 2 s
    by construction — slow in the bench AND in isolation) must come back
    "REAL regression" and exit non-zero, with cleared=false recorded in
    the artifact's adjudication block.
 2. POSITIVE control: a genuinely cheap query (q_count_rows at sf0.001)
    with an inflated bench number must self-clear in isolation and exit
    zero.
 3. Plumbing controls (no JVM): >MAX_ADJUDICATED flagged queries fail
    outright; a query missing from the new run fails as coverage loss.

Usage: python3 scripts/test_compare_bench.py   (exit 0 = all controls hold)
Wired into scripts/rehearse.sh so every rehearsal re-proves the gate.
"""
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


def artifact(path: str, queries: dict) -> None:
    with open(path, "w") as f:
        json.dump({"metric": "total", "value": sum(queries.values()),
                   "unit": "sec", "queries": queries, "sf": SF,
                   "failed": 0}, f)
        f.write("\n")


def compare(base_q: dict, new_q: dict, ratio: str = "3.0"):
    with tempfile.TemporaryDirectory() as d:
        b, n = os.path.join(d, "base.json"), os.path.join(d, "new.json")
        artifact(b, base_q)
        artifact(n, new_q)
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts/compare_bench.py"),
             b, n, ratio],
            capture_output=True, text=True, timeout=1800)
        adj = None
        try:
            with open(n) as f:
                adj = json.loads(f.read().strip().splitlines()[-1]) \
                    .get("adjudication")
        except Exception:  # noqa: BLE001
            pass
        return p.returncode, p.stdout + p.stderr, adj


def check(name: str, ok: bool, detail: str = "") -> bool:
    print(f"{'PASS' if ok else 'FAIL'}: {name}" +
          (f"\n{detail}" if not ok and detail else ""))
    return ok


def main() -> None:
    ok = True
    # 1. NEGATIVE control — slow everywhere, must NOT clear
    rc, out, adj = compare({"slow_probe": 0.05}, {"slow_probe": 5.0})
    ok &= check("real regression flips rc non-zero",
                rc != 0 and "REAL regression" in out, out)
    ok &= check("real regression recorded cleared=false",
                bool(adj) and adj.get("slow_probe", {}).get("cleared") is False,
                json.dumps(adj))
    # 2. POSITIVE control — a stall-inflated cheap query self-clears
    rc, out, adj = compare({"q_count_rows": 0.5}, {"q_count_rows": 30.0})
    ok &= check("stall-inflated query self-clears in isolation",
                rc == 0 and "self-cleared" in out, out)
    ok &= check("stall recorded cleared=true",
                bool(adj) and adj.get("q_count_rows", {}).get("cleared") is True,
                json.dumps(adj))
    # 3a. too many flagged queries = not a stall window, fail outright
    many_base = {f"q{i}": 0.1 for i in range(12)}
    many_new = {f"q{i}": 50.0 for i in range(12)}
    rc, out, _ = compare(many_base, many_new)
    ok &= check("mass slowdown fails without isolation",
                rc != 0 and "too many" in out, out)
    # 3b. coverage loss: a baseline query missing from the new run
    rc, out, _ = compare({"qa": 0.1, "qb": 0.1}, {"qa": 0.1})
    ok &= check("missing query fails as coverage loss",
                rc != 0 and "missing" in out, out)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
