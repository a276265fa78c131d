#!/bin/bash
# Contention-injection harness for the bench taint stamp (the "done"
# criterion of making the bench self-adjudicating): spin N busy loops,
# wait for the 1-min load to cross the taint threshold, run Bench at a
# small SF with the committed record redirected via
# SPARK_GRAFT_BENCH_OUT, then assert the artifact marks affected rows
# tainted — a contended record must self-identify from the JSON alone.
#
#   tools/taint_inject.sh [n_busy_loops] [sf_dir] [out_json]
set -euo pipefail
N=${1:-16}
SF=${2:-/root/testdata/sf0.01}
OUT=${3:-/tmp/taint_bench.json}

pids=()
for _ in $(seq "$N"); do ( while :; do :; done ) & pids+=($!); done
trap 'kill "${pids[@]}" 2>/dev/null || true' EXIT

echo "[taint-inject] $N busy loops started; waiting for 1-min load > 4.5"
until awk '{exit !($1 > 4.5)}' /proc/loadavg; do sleep 5; done
echo "[taint-inject] load $(cut -d' ' -f1 /proc/loadavg) — running bench at $SF"
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_BENCH_OUT="$OUT" \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -2

python3 - "$OUT" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
print("load_max", d["load_max"], "tainted", len(d["tainted"]),
      "of", d["n_queries"], "rerun", len(d["rerun"]))
assert d["tainted"], "no rows marked tainted under sustained injected load"
print("TAINT INJECTION OK: contended rows self-identify in the artifact")
EOF
