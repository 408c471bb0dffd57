#!/usr/bin/env bash
# CPU-pinned maintenance scaling benchmark: runs the identical compact+
# cluster job at 8 and 32 genuinely-available CPUs (taskset) in separate
# JVMs, then combines the two measurements into BENCH.md.
# Usage: scripts/scaling_bench.sh [nConvs]   (after `sbt compile`)
set -euo pipefail
cd "$(dirname "$0")/.."

NCONVS="${1:-150000}"
CP="target/scala-2.13/classes:src/main/resources:/opt/spark/jars/*"
OPTS=(
  --add-opens=java.base/java.lang=ALL-UNNAMED
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED
  --add-opens=java.base/java.io=ALL-UNNAMED
  --add-opens=java.base/java.net=ALL-UNNAMED
  --add-opens=java.base/java.nio=ALL-UNNAMED
  --add-opens=java.base/java.util=ALL-UNNAMED
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED
  --add-opens=java.base/sun.security.action=ALL-UNNAMED
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED
  -Dspark.ui.enabled=false
  -Dspark.sql.session.timeZone=UTC
  -Xmx24g
)

taskset -c 0-7  java "${OPTS[@]}" -cp "$CP" graft.ScalingBench single 8  "$NCONVS" target/scalebench/r8.json
taskset -c 0-31 java "${OPTS[@]}" -cp "$CP" graft.ScalingBench single 32 "$NCONVS" target/scalebench/r32.json
java "${OPTS[@]}" -cp "$CP" graft.ScalingBench report target/scalebench/r8.json target/scalebench/r32.json
