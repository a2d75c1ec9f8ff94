#!/bin/bash
# Round-4 phase 3: the north-star runs with the Newton-polished MAP
# (phase 2's prepared-precond jobs launched before the polish landed).
set -u
LOGS=/root/repo/benchdata/logs_r4
mkdir -p "$LOGS"
cd /root/repo/scripts
run() {
  local t=$1 name=$2; shift 2
  echo "[$(date +%H:%M:%S)] start $name: $*"
  timeout "$t" "$@" > "$LOGS/$name.log" 2>&1
  echo "[$(date +%H:%M:%S)] done  $name (exit $?)"
  sleep 45
}
run 4500 nuts_128_prep_precond_v2 python nuts_bench.py 100000 5000 500 1000 128 prepared precond chunk=25 depth=10
run 4500 nuts_64_prep_precond_v2  python nuts_bench.py 100000 5000 500 1000 64 prepared precond chunk=25 depth=10
# synthetic with small chunks: early-warmup trees can max depth 10, and
# 25 such draws exceed the relay's execution-duration bound (the phase-2
# crash); 4 draws/chunk keeps the worst chunk under ~30 s
run 5400 nuts_128_synth_precond_v2 python nuts_bench.py 100000 5000 300 500 128 precond chunk=4 depth=10
# TPU contract tests, from the repo root this time (the phase-2 attempt
# ran from scripts/ and could not import the package)
cd /root/repo
run 2400 tpu_contracts_v2 env MELLON_TPU_TESTS=1 python -m pytest tests/test_tpu_contracts.py -m tpu -v
cd /root/repo/scripts

# f64-CPU batched ls_time arbiter (see the script docstring)
run 3600 ls_time_f64_batched env -u PALLAS_AXON_POOL_IPS -u JAX_PLATFORMS python ls_time_f64_batched.py

echo "[$(date +%H:%M:%S)] phase 3 complete"
