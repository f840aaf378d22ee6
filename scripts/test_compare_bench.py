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


def artifact(path: str, queries: dict, same_jvm: dict = None) -> None:
    with open(path, "w") as f:
        doc = {"metric": "total", "value": sum(queries.values()),
               "unit": "sec", "queries": queries, "sf": SF, "failed": 0}
        if same_jvm is not None:
            doc["same_jvm_queries"] = same_jvm
        json.dump(doc, f)
        f.write("\n")


def compare(base_q: dict, new_q: dict, ratio: str = "3.0",
            new_same_jvm: dict = None):
    with tempfile.TemporaryDirectory() as d:
        b, n = os.path.join(d, "base.json"), os.path.join(d, "new.json")
        artifact(b, base_q)
        artifact(n, new_q, same_jvm=new_same_jvm)
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts/compare_bench.py"),
             b, n, ratio],
            capture_output=True, text=True, timeout=1800)
        art = {}
        try:
            with open(n) as f:
                art = json.loads(f.read().strip().splitlines()[-1])
        except Exception:  # noqa: BLE001
            pass
        return p.returncode, p.stdout + p.stderr, art.get("adjudication"), \
            art.get("fresh_same_adjudication")


def check(name: str, ok: bool, detail: str = "") -> bool:
    print(f"{'PASS' if ok else 'FAIL'}: {name}" +
          (f"\n{detail}" if not ok and detail else ""))
    return ok


def main() -> None:
    ok = True
    # 1. NEGATIVE control — slow everywhere, must NOT clear
    rc, out, adj, _ = compare({"slow_probe": 0.05}, {"slow_probe": 5.0})
    ok &= check("real regression flips rc non-zero",
                rc != 0 and "REAL regression" in out, out)
    ok &= check("real regression recorded cleared=false",
                bool(adj) and adj.get("slow_probe", {}).get("cleared") is False,
                json.dumps(adj))
    # 2. POSITIVE control — a stall-inflated cheap query self-clears
    rc, out, adj, _ = compare({"q_count_rows": 0.5}, {"q_count_rows": 30.0})
    ok &= check("stall-inflated query self-clears in isolation",
                rc == 0 and "self-cleared" in out, out)
    ok &= check("stall recorded cleared=true",
                bool(adj) and adj.get("q_count_rows", {}).get("cleared") is True,
                json.dumps(adj))
    # 3a. too many flagged queries = not a stall window, fail outright
    many_base = {f"q{i}": 0.1 for i in range(12)}
    many_new = {f"q{i}": 50.0 for i in range(12)}
    rc, out, _, _ = compare(many_base, many_new)
    ok &= check("mass slowdown fails without isolation",
                rc != 0 and "too many" in out, out)
    # 3b. coverage loss: a baseline query missing from the new run
    rc, out, _, _ = compare({"qa": 0.1, "qb": 0.1}, {"qa": 0.1})
    ok &= check("missing query fails as coverage loss",
                rc != 0 and "missing" in out, out)
    # 4. fresh-vs-same posture controls (VERDICT r14 #6): a divergent
    # posture pair is re-run in isolation against the FASTER posture.
    # 4a. POSITIVE: a cheap query whose fresh number was stall-inflated
    # self-clears (isolated warm is back inside 3x the faster posture).
    rc, out, _, fsa = compare({"q_count_rows": 0.5}, {"q_count_rows": 5.0},
                              new_same_jvm={"q_count_rows": 0.1})
    ok &= check("posture stall self-clears in isolation",
                rc == 0 and "posture stall" in out, out)
    ok &= check("posture stall recorded cleared=true",
                bool(fsa)
                and fsa.get("q_count_rows", {}).get("cleared") is True,
                json.dumps(fsa))
    # 4b. NEGATIVE: slow_probe (2 s by construction) cannot get back
    # inside 3x a 0.1 s posture — a REAL divergence must flip rc even
    # though the round-over-round K-gate itself is green.
    rc, out, _, fsa = compare({"slow_probe": 5.0}, {"slow_probe": 5.0},
                              new_same_jvm={"slow_probe": 0.1})
    ok &= check("real posture divergence flips rc non-zero",
                rc != 0 and "REAL divergence" in out, out)
    ok &= check("real posture divergence recorded cleared=false",
                bool(fsa)
                and fsa.get("slow_probe", {}).get("cleared") is False,
                json.dumps(fsa))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
