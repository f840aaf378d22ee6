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

Self-adjudication (VERDICT r11 #3): every K-gate-flagged query is
automatically re-run in ISOLATION (graft.Profile, 2 reps in one JVM:
cold + warm) against the new run's sf dir, and
{bench_s, isolated_cold_s, isolated_warm_s, cleared} is recorded per
flagged query under an "adjudication" key appended into NEW.json. A
query whose bench number was inflated by a multi-tenant CPU stall
self-clears (its warm isolated time is back inside the gate); a REAL
skew regression is slow in isolation too and still flips rc non-zero.
The warm rep is the adjudicating number: the isolated JVM rebuilds
stored indexes on the cold rep, which would bill build cost to a
serve-gate decision.
"""
import json
import os
import re
import subprocess
import sys

ADD_OPENS = [
    f"--add-opens=java.base/{p}=ALL-UNNAMED"
    for p in [
        "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
        "java.net", "java.nio", "java.util", "java.util.concurrent",
        "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
        "sun.security.action", "sun.util.calendar",
    ]
]
MAX_ADJUDICATED = 10  # more flagged queries than this is not a stall window


def load(path: str) -> dict:
    with open(path) as f:
        txt = f.read()
    # accept either a raw Bench line or a driver artifact wrapping it
    for line in txt.splitlines():
        line = line.strip()
        if line.startswith('{"metric"'):
            d = json.loads(line)
            if "queries" in d:
                return d
            # schema-2 summary: the per-query map lives in the detail file
            if d.get("detail") and os.path.exists(d["detail"]):
                return load(d["detail"])
            return d
    d = json.loads(txt)
    return d if "queries" in d else json.loads(d["raw"])


def isolate(sf_dir: str, query: str) -> tuple:
    """Run one query twice in a fresh JVM (graft.Profile); return
    (cold_s, warm_s) or (None, None) if the run or parse failed."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_CPUS", "8")
    cmd = (
        ["java"] + ADD_OPENS
        + ["-Xmx24g", "-cp",
           os.path.join(repo, "target/scala-2.13/classes") + ":/opt/spark/jars/*",
           "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
           "-Dfile.encoding=UTF-8", "-Dsun.jnu.encoding=UTF-8",
           "graft.Profile", sf_dir, query, query]
    )
    try:
        out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                             timeout=1800).stdout
    except Exception as e:  # noqa: BLE001 — record, don't crash the gate
        print(f"  adjudication run failed for {query}: {e}")
        return None, None
    times = [float(m.group(1))
             for line in out.splitlines()
             if line.startswith(query)
             for m in [re.search(r"(\d+\.\d+)s", line)]
             if m]
    return (times[0], times[1]) if len(times) >= 2 else (None, None)


def record_in_artifact(path: str, key: str, value: dict) -> None:
    """Append an adjudication block into the artifact's last JSON line so
    the verdict is self-contained — no hand re-runs needed to read it."""
    try:
        with open(path) as f:
            artifact = json.loads(f.read().strip().splitlines()[-1])
        artifact[key] = value
        with open(path, "w") as f:
            json.dump(artifact, f, separators=(",", ":"))
            f.write("\n")
    except Exception as e:  # noqa: BLE001
        print(f"  (could not write {key} into {path}: {e})")


def fresh_same_check(new: dict, new_path: str) -> bool:
    """Fresh-vs-same JVM divergence control (VERDICT r14 #6): when the
    artifact carries both postures, a query whose fresh and same-JVM
    serve numbers diverge >3x (plus the 0.5 s noise floor) is re-run in
    isolation; the warm rep adjudicates against the FASTER posture — a
    stall-inflated posture self-clears, a genuine posture-dependent
    slowdown (e.g. a cost only a cold JVM pays every time) stays red."""
    same = new.get("same_jvm_queries")
    if not same:
        return True  # single-posture artifact: nothing to compare
    max_div, floor = 3.0, 0.5
    flagged = [(q, tf, same[q]) for q, tf in sorted(new["queries"].items())
               if q in same
               and max(tf, same[q]) > max_div * min(tf, same[q]) + floor]
    if not flagged:
        print(f"fresh-vs-same: all queries within {max_div}x across postures")
        return True
    print(f"{len(flagged)} query(ies) diverge >{max_div}x between fresh and "
          f"same-JVM postures — re-running each in isolation:")
    sf_dir = new.get("sf", "")
    adjudication = {}
    real = []
    for q, t_fresh, t_same in flagged:
        lo = min(t_fresh, t_same)
        cold, warm = isolate(sf_dir, q)
        cleared = warm is not None and warm <= max_div * lo + floor
        adjudication[q] = {
            "fresh_s": t_fresh, "same_jvm_s": t_same,
            "isolated_cold_s": cold, "isolated_warm_s": warm,
            "cleared": cleared,
        }
        verdict = "cleared (posture stall)" if cleared else "REAL divergence"
        print(f"  {q}: fresh {t_fresh:.3f}s same {t_same:.3f}s, isolated "
              f"cold={cold if cold is not None else 'n/a'} "
              f"warm={warm if warm is not None else 'n/a'} -> {verdict}")
        if not cleared:
            real.append(q)
    record_in_artifact(new_path, "fresh_same_adjudication", adjudication)
    if real:
        print(f"FAIL: {len(real)} query(ies) genuinely diverge across JVM "
              f"postures: {', '.join(real)}")
        return False
    print("OK: all posture divergences self-cleared in isolation")
    return True


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
    # fresh-vs-same posture control first: its record lands in the
    # artifact before (and independently of) the K-gate adjudication
    fs_ok = fresh_same_check(new, sys.argv[2])
    if bad:
        if len(bad) > MAX_ADJUDICATED:
            print(f"FAIL: {len(bad)} query(ies) above {max_ratio}x — too many "
                  f"to be a stall window, skipping isolation:")
            for q, tb, tn, r in bad:
                print(f"  {q}: {tb:.3f}s -> {tn:.3f}s ({r:.1f}x)")
            sys.exit(1)
        print(f"{len(bad)} query(ies) above {max_ratio}x — re-running each "
              f"in isolation (2 reps; warm rep adjudicates):")
        sf_dir = new.get("sf", "")
        adjudication = {}
        real = []
        for q, tb, tn, r in bad:
            cold, warm = isolate(sf_dir, q)
            cleared = warm is not None and warm <= max_ratio * tb + floor
            adjudication[q] = {
                "base_s": tb, "bench_s": tn,
                "isolated_cold_s": cold, "isolated_warm_s": warm,
                "cleared": cleared,
            }
            verdict = "cleared (bench stall)" if cleared else "REAL regression"
            print(f"  {q}: bench {tn:.3f}s, isolated cold="
                  f"{cold if cold is not None else 'n/a'} warm="
                  f"{warm if warm is not None else 'n/a'} -> {verdict}")
            if not cleared:
                real.append((q, tb, tn, warm))
        # record the adjudication inside the new artifact so the verdict
        # is self-contained — no hand re-runs needed to interpret it
        record_in_artifact(sys.argv[2], "adjudication", adjudication)
        if real:
            print(f"FAIL: {len(real)} query(ies) slow in isolation too:")
            for q, tb, tn, warm in real:
                print(f"  {q}: base {tb:.3f}s, isolated warm {warm}s")
            sys.exit(1)
        print(f"OK: all flagged queries self-cleared in isolation "
              f"(adjudication recorded in {sys.argv[2]})")
        sys.exit(0 if fs_ok else 1)
    print(f"OK: all queries within {max_ratio}x")
    if not fs_ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
