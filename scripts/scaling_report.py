#!/usr/bin/env python3
"""Per-family serve-time scaling across bench artifacts (builder tooling).

Usage: python3 scripts/scaling_report.py LABEL=ARTIFACT [LABEL=ARTIFACT ...]
e.g.   python3 scripts/scaling_report.py sf0.1=BENCH_DETAIL.json \
           sf1=BENCH_sf1.json sf3=BENCH_sf3.json

Groups queries by family (the shared prefix up to the second underscore —
graft.Bench's settle granularity), sums serve seconds per family per
artifact, and prints a markdown table with the ratio of each column to
the first (the scaling exponent evidence for SURVEY §10). Only queries
present in ALL artifacts are summed, so a gate added between rounds
cannot masquerade as scaling.

--same reads the `same_jvm_queries` pass from every artifact instead of
the headline (fresh-JVM) pass: the fork child carries a 45-minute
watchdog, so the largest rehearsal decade (sf9.9) can only be recorded
same-JVM — comparing it against fresh-posture columns would mix
postures (the same-JVM pass at sf3 runs ~46% above fresh because it
shares its JVM with the index builds). With --same, every column is the
same posture and the ratios are meaningful.
"""
import json
import sys

SAME = "--same" in sys.argv


def load(path: str) -> dict:
    with open(path) as f:
        d = json.loads(f.read().strip().splitlines()[-1])
    if SAME:
        if "same_jvm_queries" not in d:
            raise SystemExit(f"{path}: no same_jvm_queries pass recorded")
        return d["same_jvm_queries"]
    return d["queries"]


def family(name: str) -> str:
    return "_".join(name.split("_")[:2])


def main() -> None:
    cols = [a.split("=", 1) for a in sys.argv[1:] if a != "--same"]
    data = [(label, load(path)) for label, path in cols]
    common = set(data[0][1])
    for _, q in data[1:]:
        common &= set(q)
    fams = sorted({family(q) for q in common})
    print("| family | n | " +
          " | ".join(label for label, _ in data) +
          " | " + " | ".join(f"{label}/{data[0][0]}"
                             for label, _ in data[1:]) + " |")
    print("|" + "---|" * (2 + len(data) + len(data) - 1))
    totals = [0.0] * len(data)
    for fam in fams:
        qs = [q for q in common if family(q) == fam]
        sums = [sum(qmap[q] for q in qs) for _, qmap in data]
        for i, v in enumerate(sums):
            totals[i] += v
        ratios = [f"{sums[i] / max(sums[0], 1e-9):.2f}x"
                  for i in range(1, len(sums))]
        print(f"| {fam} | {len(qs)} | " +
              " | ".join(f"{v:.2f}" for v in sums) +
              " | " + " | ".join(ratios) + " |")
    ratios = [f"{totals[i] / max(totals[0], 1e-9):.2f}x"
              for i in range(1, len(totals))]
    print(f"| **total** | {len(common)} | " +
          " | ".join(f"{v:.1f}" for v in totals) +
          " | " + " | ".join(f"**{r}**" for r in ratios) + " |")


if __name__ == "__main__":
    main()
