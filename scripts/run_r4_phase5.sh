#!/bin/bash
# Round-4 phase 5: re-measure every fidelity/throughput row touched by the
# matmul-precision fixes (true-f32 grams/TRSM/chol + HIGHEST loss matvec):
#   - 98k d=2 time-series default-path cert (was corr 0.723)
#   - automatic ls_time at the d=2 bench shape (f32 batched was 19.55 vs
#     f64 truth 24.52; the f64 BATCHED arbiter reproduced the truth
#     exactly, so the drift is pure arithmetic — now reduced at source)
#   - sparse_nystroem row cert (was 0.99942 on TPU)
#   - 1M-cell atlas NUTS (the old 11.7 draws/s had every tree at the
#     depth-7 cap — the broken potential surface)
#   - SMC sweeps (density_loglik precision changed)
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
run 3600 time_bench_p5    python time_bench.py
run 2400 matched_inputs_p5 python matched_inputs_experiment.py
run 2400 ls_time_d2_p5    python ls_time_bench.py 2
run 2400 nystroem_p5      python nystroem_recheck.py
run 3600 atlas_nuts_p5    python atlas_nuts_bench.py
run 2400 smc_p5           python smc_bench.py
run 2400 smc_laplace_p5   python smc_bench.py 100000 512 1024 laplace
# 3-pass matvec probe: throughput + posterior-agreement vs the 6-pass
# default (same seed; compare ESS/s and the reported moments/Rhat)
run 2400 nuts_128_precond_high_p5 env MELLON_TPU_MATVEC_PRECISION=high \
  python nuts_bench.py 100000 5000 500 1000 128 prepared precond chunk=25 depth=10
# the literal synthetic BASELINE shape (5000-dim latent, no pruning):
# preconditioned (the Hessian build is ~5 min at m=5000, then trees turn
# early), and a depth-7 diagonal variant (the depth-10 diagonal run's
# early warmup trees at 1023 leapfrogs x 5000-wide matvecs overran the
# phase-4 timeout)
run 5400 nuts_128_synth_precond_p5 python nuts_bench.py 100000 5000 300 500 128 precond chunk=4 depth=10
run 5400 nuts_128_synth_d7_p5      python nuts_bench.py 100000 5000 300 500 128 chunk=10 depth=7
echo "[$(date +%H:%M:%S)] phase 5 complete"
