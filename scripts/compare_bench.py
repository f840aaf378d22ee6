#!/usr/bin/env python3
"""Compare two Bench JSON outputs (builder tooling).

Usage: python3 scripts/compare_bench.py BASE.json NEW.json [max_ratio]

Prints per-query ratios, the totals, and exits non-zero if any query
exceeds max_ratio (default 12, the rehearsal gate) by more than an
absolute NOISE margin: a query fails when t_new > max_ratio * t_base +
0.5 s. The additive margin is what makes the gate meaningful on
sub-second queries — a 0.16 s -> 0.56 s "3.4x" is one scheduler stall,
not a skew problem (measured warm ratio 1.1x), while every real skew
regression (r8 minhash: 9.3 s -> 33.4 s) clears the margin by seconds.
"""
import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        txt = f.read()
    # accept either a raw Bench line or a driver artifact wrapping it
    for line in txt.splitlines():
        line = line.strip()
        if line.startswith('{"metric"'):
            return json.loads(line)
    d = json.loads(txt)
    return d if "queries" in d else json.loads(d["raw"])


def main() -> None:
    base, new = load(sys.argv[1]), load(sys.argv[2])
    max_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 12.0
    floor = 0.5
    # a query present in the baseline but MISSING from the new run is a
    # coverage loss, not a speedup — the gate must fail, not shrink
    gone = sorted(set(base["queries"]) - set(new["queries"]))
    bad = []
    rows = []
    for q, t_new in sorted(new["queries"].items()):
        t_base = base["queries"].get(q)
        if t_base is None:
            rows.append((q, t_new, None, None))
            continue
        ratio = t_new / max(t_base, 1e-9)
        rows.append((q, t_new, t_base, ratio))
        if t_new > max_ratio * t_base + floor:
            bad.append((q, t_base, t_new, ratio))
    rows.sort(key=lambda r: -(r[3] or 0))
    for q, t_new, t_base, ratio in rows[:15]:
        print(f"{q:32s} base={t_base if t_base is not None else '-':>8} "
              f"new={t_new:8.3f} ratio={ratio if ratio else float('nan'):6.2f}")
    print(f"totals: base={base['value']:.1f}s new={new['value']:.1f}s "
          f"({new['value']/max(base['value'],1e-9):.2f}x), "
          f"failed: base={base.get('failed')} new={new.get('failed')}")
    if new.get("failed"):
        print("FAIL: new run has failed queries:", new.get("errors"))
        sys.exit(1)
    # a failed BASELINE is just as disqualifying: its queries dict is
    # missing the failed entries, so every downstream ratio is fiction
    if base.get("failed"):
        print("FAIL: baseline run has failed queries:", base.get("errors"))
        sys.exit(1)
    if gone:
        print(f"FAIL: {len(gone)} baseline query(ies) missing from the new run:")
        print("  " + ", ".join(gone))
        sys.exit(1)
    if bad:
        print(f"FAIL: {len(bad)} query(ies) above {max_ratio}x:")
        for q, tb, tn, r in bad:
            print(f"  {q}: {tb:.3f}s -> {tn:.3f}s ({r:.1f}x)")
        sys.exit(1)
    print(f"OK: all queries within {max_ratio}x")


if __name__ == "__main__":
    main()
