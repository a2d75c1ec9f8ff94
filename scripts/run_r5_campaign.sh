#!/bin/bash
# Round-5 finishing campaign (VERDICT r4 "Next round" items 1,3,4,6,7,8):
#   1. 98k d=2 time-series cert on the chunked-TRSM + accurate-grams +
#      HIGHEST-fused-prepare code (the round-4 OOM fix, never yet executed)
#   3. chunked atlas NUTS (steps_per_call=5; the monolithic program killed
#      the TPU worker in round 4)
#   4. the literal synthetic 100k x 5000-latent north-star rows
#      (preconditioned + depth-7 diagonal)
#   6. ls_time f64 arbitration + d=2 bench post-precision-fix
#   7. HIGHEST-vs-high matvec posterior agreement (same model, saved
#      moments, scripts/precision_agreement.py)
#   8. SMC evidence with laplace start + across-sweep error bar
#
# Driver fixes vs run_r4_phase5.sh (VERDICT weak #3): the child exit code
# is captured IMMEDIATELY (the old `echo "[$(date)] done (exit $?)"`
# clobbered $? with date's status, recording every crash as exit 0), and
# the log tail is scanned for error signatures; failures are loud.
set -u
LOGS=/root/repo/benchdata/logs_r5
mkdir -p "$LOGS"
cd /root/repo/scripts
FAILED=0
run() {
  local t=$1 name=$2; shift 2
  echo "[$(date +%H:%M:%S)] start $name: $*"
  timeout "$t" "$@" > "$LOGS/$name.log" 2>&1
  local rc=$?   # capture BEFORE any other command can clobber it
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

# --- task 1: the 98k acceptance bar (highest leverage) ---------------------
run 5400 time_bench_r5     python time_bench.py

# --- task 3: chunked atlas NUTS -------------------------------------------
run 3600 atlas_nuts_r5     python atlas_nuts_bench.py

# --- task 7: precision-knob posterior agreement (cheap, ~2 min each) ------
run 2400 nuts_prep_precond_highest_r5 python nuts_bench.py 100000 5000 500 1000 128 \
  prepared precond chunk=25 depth=10 save=$LOGS/moments_highest.npz
run 2400 nuts_prep_precond_high_r5 env MELLON_TPU_MATVEC_PRECISION=high \
  python nuts_bench.py 100000 5000 500 1000 128 \
  prepared precond chunk=25 depth=10 save=$LOGS/moments_high.npz
run 300  precision_agreement_r5 python precision_agreement.py \
  $LOGS/moments_highest.npz $LOGS/moments_high.npz highest high

# --- task 4: the literal synthetic 5000-latent north-star -----------------
run 5400 nuts_128_synth_precond_r5 python nuts_bench.py 100000 5000 300 500 128 \
  precond chunk=4 depth=10 save=$LOGS/moments_synth_f32.npz
run 5400 nuts_128_synth_d7_r5      python nuts_bench.py 100000 5000 300 500 128 \
  chunk=10 depth=7

# --- bf16-storage agreement (advertised trade; VERDICT weak #8) -----------
run 5400 nuts_128_synth_precond_bf16_r5 python nuts_bench.py 100000 5000 300 500 128 \
  precond chunk=4 depth=10 bf16 save=$LOGS/moments_synth_bf16.npz
run 300  bf16_agreement_r5 python precision_agreement.py \
  $LOGS/moments_synth_f32.npz $LOGS/moments_synth_bf16.npz f32 bf16

# --- task 6: ls_time arbitration ------------------------------------------
run 2400 ls_time_truth_r5  python ls_time_truth_experiment.py
run 2400 ls_time_f64_batched_r5 python ls_time_f64_batched.py
run 2400 ls_time_d2_r5     python ls_time_bench.py 2

# --- task 8: SMC evidence, laplace start, error bar -----------------------
run 2400 smc_laplace_reps_r5 python smc_bench.py 100000 512 1024 laplace repeats=5
run 2400 smc_prior_reps_r5   python smc_bench.py 100000 512 1024 repeats=3

echo "[$(date +%H:%M:%S)] campaign complete ($FAILED failures)"
