#!/bin/bash
# Scale rehearsal (builder tooling): bench the FULL query surface at the
# amplified sf1 and the skewed sf1z, record BENCH_sf1.json /
# BENCH_sf1z.json, then gate the zipf-vs-sf1 per-query ratio so a skew
# regression (VERDICT r8: minhash band self-join, 33.4 s zipf vs 9.3 s
# sf1) flips rc non-zero mechanically instead of needing plan archaeology.
#
# Usage: scripts/rehearse.sh [K] [--sf3]
#   K      = zipf-ratio gate, default 3.0 — the r8 regression sat at
#            3.6x; every legitimate query is well under 2x
#   --sf3  = additionally bench the 30x sf3/sf3z decade (VERDICT r14 #1:
#            measure the scaling exponent PAST sf1) into BENCH_sf3.json /
#            BENCH_sf3z.json with the same zipf K-gate, plus a 1.5x
#            totals gate on zipf-vs-uniform
# pipefail: Bench exits non-zero when any query fails — without it the
# pipe into grep swallows the rc and a broken BASELINE records as a
# green rehearsal artifact (r10 review finding)
set -eo pipefail
cd "$(dirname "$0")/.."
SF3=0
ARGS=()
for a in "$@"; do
  case "$a" in
    --sf3) SF3=1 ;;
    *) ARGS+=("$a") ;;
  esac
done
K=${ARGS[0]:-3.0}
# prove the K-gate's self-adjudication still distinguishes a real
# regression from a stall BEFORE trusting it with tonight's numbers
# (scripts/test_compare_bench.py, VERDICT r12 #7)
python3 scripts/test_compare_bench.py
[ -d target/sf1 ]  || python3 scripts/make_sf1.py target/sf1
[ -d target/sf1z ] || python3 scripts/make_sf1.py --zipf target/sf1z
CP="target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
# Bench writes the per-query detail JSON to SPARK_GRAFT_BENCH_DETAIL
# itself (schema 2: stdout carries only the compact summary), so the
# artifact comes from the file, not a stdout grep.
bench() {
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
    SPARK_GRAFT_BENCH_DETAIL="$2" \
    java $ADD_OPENS -Xmx24g -cp "$CP" \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Dfile.encoding=UTF-8 -Dsun.jnu.encoding=UTF-8 \
    graft.Bench 2>/dev/null | tail -1
}
bench target/sf1  BENCH_sf1.json
bench target/sf1z BENCH_sf1z.json
# the zipf gate: same volume, production-shaped hot keys — any query
# whose skewed time exceeds K x its uniform time has a skew problem
python3 scripts/compare_bench.py BENCH_sf1.json BENCH_sf1z.json "$K"
if [ "$SF3" = 1 ]; then
  [ -d target/sf3 ]  || python3 scripts/make_sf1.py --copies=30 target/sf3
  [ -d target/sf3z ] || python3 scripts/make_sf1.py --zipf --copies=30 target/sf3z
  bench target/sf3  BENCH_sf3.json
  bench target/sf3z BENCH_sf3z.json
  python3 scripts/compare_bench.py BENCH_sf3.json BENCH_sf3z.json "$K"
  # the r14 #1 done-bar: skewed TOTAL within 1.5x of uniform at sf3
  python3 - <<'PY'
import json
def total(p):
    with open(p) as f:
        return json.loads(f.read().strip().splitlines()[-1])["value"]
u, z = total("BENCH_sf3.json"), total("BENCH_sf3z.json")
r = z / u
print(f"sf3 zipf totals gate: uniform={u:.1f}s zipf={z:.1f}s ratio={r:.2f}")
raise SystemExit(0 if r <= 1.5 else 1)
PY
fi
