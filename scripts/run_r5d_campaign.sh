#!/bin/bash
# Round-5 fourth wave: the synthetic 5000-latent preconditioned rows with
# BOTH fixes in place — the zero-centered potential (trees turn at 15
# leapfrogs; proven by nuts_probe_synth_precond_r5c) AND chunk=4 program
# sizing (chunk=25 lets an early-warmup chunk of depth-10 trees exceed
# the relay's single-execution duration bound and kills the TPU worker —
# the r5c 32-chain failure).
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
  sleep 45
}

run 3600 nuts_128_synth_precond_r5d python nuts_bench.py 100000 5000 300 500 128 \
  precond chunk=4 depth=10 save=$LOGS/moments_synth_f32.npz
run 3600 nuts_128_synth_precond_bf16_r5d python nuts_bench.py 100000 5000 300 500 128 \
  precond chunk=4 depth=10 bf16 save=$LOGS/moments_synth_bf16.npz
run 300  bf16_agreement_r5d python precision_agreement.py \
  $LOGS/moments_synth_f32.npz $LOGS/moments_synth_bf16.npz f32 bf16

echo "[$(date +%H:%M:%S)] r5d campaign complete ($FAILED failures)"
