#!/bin/bash
# Builder tooling: run graft.Verify straight from compiled classes (fast
# iteration — no sbt startup).
# Usage: scripts/run_verify.sh [sfDir] [outDir] [queryName...]
# Extra args filter the dump to those queries (targeted re-checks).
set -e
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-target/verify_sf001}
shift 2 2>/dev/null || shift $# 2>/dev/null || true
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
exec java $ADD_OPENS -Xmx8g -cp "$CP" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Dfile.encoding=UTF-8 -Dsun.jnu.encoding=UTF-8 \
  graft.Verify "$SF" "$OUT" "$@" 2> >(grep -v '^2[0-9]' >&2 || true)
