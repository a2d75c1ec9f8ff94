#!/bin/bash
# Round-5 follow-up campaign: runs after run_r5_campaign.sh with the
# round-5 kNN candidate-selection fix (exact coordinate-difference
# candidates at low d + single-column within-time augmentation):
#   - the 98k d=2 cert re-run: the r5a run proved the chunked TRSM fix
#     (no OOM) but certified corr 0.911 with ls = 0.4726 vs the f64
#     prepare's 0.3490 — the matmul-form candidate noise (eps*BIG) was
#     drowning true 1-NN distances on this dense shape and inflating the
#     ls heuristic; with exact candidates the f32 prepare's inputs should
#     match f64's
#   - preconditioned atlas NUTS with real warmup (the r5a diagonal run at
#     50 warmup draws never adapts: Rhat ~15k with every tree at the cap)
#   - bench.py re-run (the headline row, post-kNN-fix provenance)
#   - TPU accuracy-contract tests
set -u
LOGS=/root/repo/benchdata/logs_r5
mkdir -p "$LOGS"
cd /root/repo/scripts
FAILED=0
run() {
  local t=$1 name=$2; shift 2
  echo "[$(date +%H:%M:%S)] start $name: $*"
  timeout "$t" "$@" > "$LOGS/$name.log" 2>&1
  local rc=$?
  local errs
  errs=$(tail -n 80 "$LOGS/$name.log" | grep -c -E \
    'Traceback|JaxRuntimeError|RESOURCE_EXHAUSTED|Segmentation fault|core dumped|FATAL' )
  if [ "$rc" -ne 0 ] || [ "$errs" -gt 0 ]; then
    FAILED=$((FAILED+1))
    echo "[$(date +%H:%M:%S)] FAILED $name (exit $rc, error-signatures $errs) — see $LOGS/$name.log"
    echo "FAILED exit=$rc error_signatures=$errs" >> "$LOGS/$name.log"
  else
    echo "[$(date +%H:%M:%S)] done  $name (exit $rc)"
  fi
  sleep 30
}

run 5400 time_bench_r5b    python time_bench.py
# the f64 arbiter must run on the CPU backend (approx_min_k has no f64
# lowering on TPU; the r5a invocation missed the env stripping)
run 3600 ls_time_f64_batched_r5b env -u PALLAS_AXON_POOL_IPS -u JAX_PLATFORMS \
  python ls_time_f64_batched.py
run 7200 atlas_nuts_precond_r5b python atlas_nuts_bench.py 1000000 50 5000 16 300 500 precond
run 1500 bench_r5b         python /root/repo/bench.py
cd /root/repo
run 3600 tpu_contracts_r5b env MELLON_TPU_TESTS=1 python -m pytest tests -m tpu -q

echo "[$(date +%H:%M:%S)] r5b campaign complete ($FAILED failures)"
