#!/bin/bash
# Run graft.Bench N times at sf0.1 and assemble BENCH_BAND.json +
# /tmp/bench_median.json (development tooling; see scripts/benchband.py).
# Usage: bash scripts/runband.sh [n_runs]
set -e
N=${1:-7}
mkdir -p /tmp/band
for i in $(seq 1 "$N"); do
  echo "[band] run $i/$N"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' | head -1 \
    > "/tmp/band/run$i.json"
done
python3 scripts/benchband.py /tmp/band/run*.json --note \
  "round-9 final inventory (204 queries), idle window (load < 1 verified), local[32] sf0.1"
