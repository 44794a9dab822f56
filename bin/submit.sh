#!/usr/bin/env bash
# spark-submit launch for the extraction engine (north-rule launch path).
# Usage: bin/submit.sh <MainClass> [cores] [args...]
#   bin/submit.sh graft.Bench 32
#   bin/submit.sh graft.Scaling 8 "50000 2 8"
# On a real cluster replace --master with the cluster manager URL and
# size --num-executors/--executor-cores for the N / 4N runs; add
#   --conf spark.sql.extensions=graft.functions.GraftExtensions
# to expose extract_main_content() to plain SQL sessions.
set -euo pipefail
cd "$(dirname "$0")/.."
MAIN="${1:?main class}"; CORES="${2:-32}"; shift 2 || true
sbt -batch package >/dev/null
exec /opt/spark/bin/spark-submit \
  --class "$MAIN" \
  --master "local[$CORES]" \
  --driver-memory "${SPARK_DRIVER_MEM:-8g}" \
  --conf spark.sql.shuffle.partitions="$CORES" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.extensions=graft.functions.GraftExtensions \
  --conf spark.local.dir="${SPARK_LOCAL_DIRS:-/dev/shm/spark-local}" \
  target/scala-2.13/vkitspark_2.13-0.1.0.jar "$@"
