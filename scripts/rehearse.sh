#!/bin/bash
# Scale rehearsal (builder tooling): bench the FULL query surface at the
# amplified sf1 and the skewed sf1z, record BENCH_sf1.json /
# BENCH_sf1z.json, then gate the zipf-vs-sf1 per-query ratio so a skew
# regression (VERDICT r8: minhash band self-join, 33.4 s zipf vs 9.3 s
# sf1) flips rc non-zero mechanically instead of needing plan archaeology.
#
# Usage: scripts/rehearse.sh [K]   (K = zipf-ratio gate, default 3.0 —
# the r8 regression sat at 3.6x; every legitimate query is well under 2x)
# pipefail: Bench exits non-zero when any query fails — without it the
# pipe into grep swallows the rc and a broken BASELINE records as a
# green rehearsal artifact (r10 review finding)
set -eo pipefail
cd "$(dirname "$0")/.."
K=${1:-3.0}
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
