#!/bin/bash
# Round-4 TPU campaign, phase 1 (sequential; never two TPU processes at
# once — relay program loads are per-process and serialize anyway).
# Logs are written straight into benchdata/logs_r4/ so the evidence ships
# with the repo (VERDICT r3 Missing #5).
set -u
LOGS=/root/repo/benchdata/logs_r4
mkdir -p "$LOGS"
cd /root/repo/scripts

run() {
  local t=$1 name=$2; shift 2
  echo "[$(date +%H:%M:%S)] start $name: $*"
  timeout "$t" "$@" > "$LOGS/$name.log" 2>&1
  echo "[$(date +%H:%M:%S)] done  $name (exit $?)"
}

# 1. the f64-L fidelity experiment (gates the double-single TRSM work)
run 4200 hostf64_L python hostf64_L_experiment.py

# 2-5. north-star NUTS: full-length runs at 64/128 chains, synthetic
#      100k x 5k AND the genuinely prepared 100k-cell model
run 5400 nuts_64_synth  python nuts_bench.py 100000 5000 500 1000 64
run 6000 nuts_128_synth python nuts_bench.py 100000 5000 500 1000 128
run 4500 nuts_64_prep   python nuts_bench.py 100000 5000 500 1000 64 prepared
run 4500 nuts_128_prep  python nuts_bench.py 100000 5000 500 1000 128 prepared

echo "[$(date +%H:%M:%S)] phase 1 complete"
