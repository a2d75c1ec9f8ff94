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

# 8-chain 30/30 probe: completes within ~2 min if trees turn (the CPU
# behavior: 15 lf/draw) and within ~10 min even at the full depth-10 cap —
# its lf/draw line settles whether the TPU trees turn at all
run 1200 nuts_probe_synth_precond_r5c python nuts_bench.py 100000 5000 30 30 8 \
  precond chunk=2 depth=10
run 2400 nuts_32_synth_precond_r5c python nuts_bench.py 100000 5000 300 500 32 \
  precond chunk=25 depth=10
run 3600 nuts_128_synth_precond_r5c python nuts_bench.py 100000 5000 300 500 128 \
  precond chunk=25 depth=10 save=$LOGS/moments_synth_f32.npz

echo "[$(date +%H:%M:%S)] r5c campaign complete ($FAILED failures)"
