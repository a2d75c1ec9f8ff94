#!/bin/bash
# Round-4 phase 4: the north-star campaign AFTER the matvec-precision root
# cause fix (losses at Precision.HIGHEST; host-f64 Hessian factor).  The
# phase-1..3 runs all sampled a potential surface carrying ~1e-3-relative
# matmul-pass noise — every tree maxed out and chains froze; these runs
# re-measure the BASELINE north star with the accurate potential.
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
# (the 8-chain probe nuts_probe_hp ran standalone before this script)

# the north-star grid: prepared model (the real pipeline), diagonal vs
# Hessian-preconditioned, 64 and 128 chains
run 3600 nuts_128_prep_hp         python nuts_bench.py 100000 5000 500 1000 128 prepared chunk=25 depth=10
run 3600 nuts_128_prep_precond_hp python nuts_bench.py 100000 5000 500 1000 128 prepared precond chunk=25 depth=10
run 3600 nuts_64_prep_precond_hp  python nuts_bench.py 100000 5000 500 1000 64 prepared precond chunk=25 depth=10
run 3600 nuts_256_prep_precond_hp python nuts_bench.py 100000 5000 500 1000 256 prepared precond chunk=25 depth=10

# the literal synthetic BASELINE shape (no pruning, 5000-dim latent)
run 5400 nuts_128_synth_hp python nuts_bench.py 100000 5000 300 500 128 chunk=4 depth=10

# headline-bench guard: HIGHEST in the MAP loop must not regress the fit
cd /root/repo
run 1500 bench_hp python bench.py

# TPU contract tests, from the repo root (phase-2 ran from scripts/ and
# could not import the package)
run 2400 tpu_contracts_v2 env MELLON_TPU_TESTS=1 python -m pytest tests/test_tpu_contracts.py -m tpu -v
cd /root/repo/scripts
# (ls_time_f64_batched + seed_floor_experiment run standalone on the CPU
# backend, sequenced separately — this box has 2 cores)

echo "[$(date +%H:%M:%S)] phase 4 complete"
