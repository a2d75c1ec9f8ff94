#!/bin/bash
# Round-4 TPU campaign, phase 1b.
#
# Phase 1 finding: the monolithic 500/1000-draw NUTS program (a 6-19 min
# single XLA execution) kills the TPU worker through the relay, while the
# r3-sized ~40 s programs and the m=512 prepared runs complete — pointing
# at an execution-DURATION bound, not memory.  The probes below bracket it
# and retest the r3 "256-chain memory envelope" claim; the north-star runs
# then use the new chunked driver (steps_per_call) with ~20-40 s chunks.
set -u
LOGS=/root/repo/benchdata/logs_r4
mkdir -p "$LOGS"
cd /root/repo/scripts

run() {
  local t=$1 name=$2; shift 2
  echo "[$(date +%H:%M:%S)] start $name: $*"
  timeout "$t" "$@" > "$LOGS/$name.log" 2>&1
  echo "[$(date +%H:%M:%S)] done  $name (exit $?)"
  sleep 60  # give the relay room to recover from any worker fault
}

# --- duration-cap probes (monolithic programs) --------------------------
run 2400 probe_r3_60x60_128    python nuts_bench.py 100000 5000 60 60 128
run 2400 probe_150x150_128     python nuts_bench.py 100000 5000 150 150 128
run 2400 probe_20x20_256       python nuts_bench.py 100000 5000 20 20 256

# --- the f64-L fidelity experiment (npz key fixed) ----------------------
run 4200 hostf64_L python hostf64_L_experiment.py

# --- north-star: chunked full-length runs -------------------------------
run 6000 nuts_128_synth python nuts_bench.py 100000 5000 500 1000 128 chunk=25
run 6000 nuts_64_synth  python nuts_bench.py 100000 5000 500 1000 64 chunk=25
run 4500 nuts_64_prep   python nuts_bench.py 100000 5000 500 1000 64 prepared chunk=25 depth=10
run 4500 nuts_128_prep  python nuts_bench.py 100000 5000 500 1000 128 prepared chunk=25 depth=10

echo "[$(date +%H:%M:%S)] phase 1b complete"
