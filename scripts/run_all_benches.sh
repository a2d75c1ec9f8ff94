#!/bin/bash
# Sequential round-measurement campaign on the attached TPU.
# Each bench gets its own log under /tmp/benchlogs; failures don't stop
# the queue.  Run from the repo root:  bash scripts/run_all_benches.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/benchlogs

run() {
  name="$1"; shift
  echo "=== $name: $* (started $(date +%H:%M:%S)) ==="
  # 3000 s: must exceed bench.py's own 2700 s watchdog so a stalled relay
  # still produces the JSON error line instead of a silent SIGTERM
  timeout 3000 "$@" > "/tmp/benchlogs/$name.log" 2>&1
  echo "=== $name: exit $? ($(date +%H:%M:%S)) ==="
}

run probe       python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones(3))))"
run bench       python bench.py
run baseline    python scripts/baseline_matrix.py
run ls_time_d2  python scripts/ls_time_bench.py 2
run ls_time_d20 python scripts/ls_time_bench.py 20
run time        python scripts/time_bench.py
run nuts        python scripts/nuts_bench.py
run predict     python scripts/predict_bench.py
run smc         python scripts/smc_bench.py
run nystroem    python scripts/nystroem_recheck.py
run tpu_tests   env MELLON_TPU_TESTS=1 python -m pytest tests/test_tpu_contracts.py -m tpu -q
run atlas       python scripts/atlas_bench.py
