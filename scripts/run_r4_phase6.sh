#!/bin/bash
# Round-4 phase 6: reruns after the OOM/duration fixes —
#   - time_bench: the 98k d=2 default-path cert (phase-5 attempt OOMed in
#     the single-program stage-2 TRSM at the new 2176-wide pivot rank;
#     stage 2 is now chunked)
#   - atlas NUTS: chunked execution (the monolithic program at 1M x 1024
#     exceeded the relay's single-execution duration bound)
#   - SMC at HIGH matvec precision (the 6-pass default cut the mutation
#     throughput 3.8x; HIGH was posterior-certified on the NUTS probe)
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
run 3600 time_bench_p6   python time_bench.py
run 3600 atlas_nuts_p6   python atlas_nuts_bench.py
run 2400 smc_laplace_high_p6 env MELLON_TPU_MATVEC_PRECISION=high python smc_bench.py 100000 512 1024 laplace
echo "[$(date +%H:%M:%S)] phase 6 complete"
