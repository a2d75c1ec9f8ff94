#!/bin/bash
# Round-4 TPU campaign, phase 2: fidelity re-certification with the
# extended-precision path, the f64-vs-f64 seed floor, ls_time truth
# rerun, the 512-chain probe, TPU contract tests, and bench.py.
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

# 1. time-series cert with the NEW full-capacity path (mode A now runs
#    host-f64 K + ds kernel eval + ds GEMM fully integrated)
run 4200 hostf64_L_v2 python hostf64_L_experiment.py

# 2. THE north-star runs: MAP-Hessian-preconditioned NUTS.  Diagonal
#    mass cannot handle this posterior (every tree maxes out at depth 7
#    AND depth 10, Rhat >> 1); the dense-metric transform makes the
#    target near-N(0, I), so ESS becomes a real measurement.
run 4500 nuts_128_prep_precond python nuts_bench.py 100000 5000 500 1000 128 prepared precond chunk=25 depth=10
run 4500 nuts_64_prep_precond  python nuts_bench.py 100000 5000 500 1000 64 prepared precond chunk=25 depth=10
run 5400 nuts_128_synth_precond python nuts_bench.py 100000 5000 300 500 128 precond chunk=25 depth=10

# 2b. 512-chain chunked probe (single-chip chain-width peak + MXU)
run 2400 probe_512_chunked python nuts_bench.py 100000 5000 20 20 512 chunk=10

# 3. ls_time at the d=2 bench shape with the ds predict for rescued
#    groups (f64 ground truth from r3 on this exact dataset: 24.52;
#    r3 TPU batched measured 19.55)
run 5400 ls_time_bench_d2 python ls_time_bench.py 2
# 3b. medium forced-rescue truth experiment (all three paths)
run 3600 ls_time_truth python ls_time_truth_experiment.py

# 4. TPU contract tests (committed pass record — VERDICT r3 Missing #4)
run 2400 tpu_contracts env MELLON_TPU_TESTS=1 python -m pytest ../tests/test_tpu_contracts.py -m tpu -v

# 5. bench.py sanity (default path must be unchanged by round-4 work)
run 2700 bench python ../bench.py

# --- CPU-only measurements (serialized after the TPU work) --------------
# 6. f64-vs-f64 seed floor: how much does the reference-numerics fit at
#    the 98k d=2 shape change under a different k-means seed?  Bounds the
#    meaningful fidelity target for ANY arithmetic.
run 5400 seed_floor env -u PALLAS_AXON_POOL_IPS -u JAX_PLATFORMS python seed_floor_experiment.py

# 7. multichip dryrun with the new self-checking SMC asserts
run 1200 dryrun_multichip env -u PALLAS_AXON_POOL_IPS -u JAX_PLATFORMS python -c "
import jax
jax.config.update('jax_num_cpu_devices', 8)
import sys; sys.path.insert(0, '/root/repo')
import __graft_entry__ as g
g.dryrun_multichip(8)
print('DRYRUN OK')
"

echo "[$(date +%H:%M:%S)] phase 2 complete"
