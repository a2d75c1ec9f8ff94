#!/bin/bash
# Round-5 third wave: retries informed by the r5a failures.
#   - synthetic 100k x 5000 preconditioned NUTS: the r5a 128-chain chunk=4
#     run produced no output for 90 min despite a CPU probe showing the
#     whitened target turns trees at exactly 15 leapfrogs (step 0.23,
#     accept 0.87) — retry at 32 chains / chunk=25 where each chunk
#     program is ~1 s, and at 128 chains / chunk=25 if the first works.
#   - SMC bench re-runs land in r5a; nothing else here.
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

# All runs below execute with the round-5 potential zero-centering fix
# (losses.density_loss loss_offset_per_term): the r5a/r5b hangs were the
# f32 quantization of the O(n) potential collapsing the step size with
# every tree at the depth cap.
# 8-chain 30/30 probe: completes within ~2 min if trees turn (the CPU
# behavior: 15 lf/draw) and within ~10 min even at the full depth-10 cap —
# its lf/draw line settles whether the TPU trees turn at all
run 1200 nuts_probe_synth_precond_r5c python nuts_bench.py 100000 5000 30 30 8 \
  precond chunk=2 depth=10
# 1M-atlas preconditioned NUTS on the fixed potential (replaces the
# killed r5b attempt)
run 5400 atlas_nuts_precond_r5c python atlas_nuts_bench.py 1000000 50 5000 16 300 500 precond
# the 1M diagonal-mass chunked row too: the r5a run's Rhat 15k was the
# same quantization pathology
run 3600 atlas_nuts_diag_r5c python atlas_nuts_bench.py 1000000 50 5000 8 300 500
run 2400 nuts_32_synth_precond_r5c python nuts_bench.py 100000 5000 300 500 32 \
  precond chunk=25 depth=10
# the synthetic depth-7 diagonal row on the fixed potential (the r5a
# Rhat-347 row was the same quantization pathology)
run 5400 nuts_128_synth_d7_r5c python nuts_bench.py 100000 5000 300 500 128 \
  chunk=10 depth=7
run 3600 nuts_128_synth_precond_r5c python nuts_bench.py 100000 5000 300 500 128 \
  precond chunk=25 depth=10 save=$LOGS/moments_synth_f32.npz
# bf16-storage agreement at the same shape (VERDICT r4 weak #8) — only
# meaningful if the f32 run above completed and saved its moments
run 3600 nuts_128_synth_precond_bf16_r5c python nuts_bench.py 100000 5000 300 500 128 \
  precond chunk=25 depth=10 bf16 save=$LOGS/moments_synth_bf16.npz
run 300  bf16_agreement_r5c python precision_agreement.py \
  $LOGS/moments_synth_f32.npz $LOGS/moments_synth_bf16.npz f32 bf16

echo "[$(date +%H:%M:%S)] r5c campaign complete ($FAILED failures)"
