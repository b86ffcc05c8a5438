#!/usr/bin/env bash
# Launch the benchmark via spark-submit — the north rule's launch mode.
#
# graft.Bench manages its own two cluster sizes internally (it builds one
# SparkSession per leg: local[N/4] then local[N] over identical input,
# interleaved best-of reps), so ONE submit covers both legs; the
# builder's .master(...) per leg intentionally overrides the submit-time
# master. On a real cluster the same jar is submitted twice instead
# (--num-executors N / 4N) with SPARK_GRAFT_CORES pinning the leg.
#
# Usage: scripts/spark_submit_bench.sh [sf_dir]   (default sf0.1)
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.1}"

sbt -batch package >/dev/null
JAR=$(ls target/scala-2.13/*.jar | grep -v tests | head -1)

SPARK_GRAFT_SF_DIR="$SF_DIR" /opt/spark/bin/spark-submit \
  --class graft.Bench \
  --master 'local[32]' \
  --driver-memory 96g \
  "$JAR"

echo "bench JSON:"
cat target/bench.json
