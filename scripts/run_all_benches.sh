#!/bin/bash
# Sequential round-measurement campaign on the attached TPU.
# Each bench gets its own log under /tmp/benchlogs; failures don't stop
# the queue.  Run from the repo root:  bash scripts/run_all_benches.sh
#
# NEVER run two TPU processes concurrently (the relay wedges); this queue
# is the only sanctioned way to run measurements.  Each log is stamped
# with the commit hash of the code state it measured (provenance: every
# PERFORMANCE.md number must be traceable to a log + hash).
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/benchlogs
HASH="$(git rev-parse --short HEAD 2>/dev/null || echo unknown)"

run() {
  name="$1"; shift
  echo "=== $name: $* (started $(date +%H:%M:%S)) ==="
  {
    echo "commit: $HASH"
    echo "cmd: $*"
    echo "started: $(date -Is)"
  } > "/tmp/benchlogs/$name.log"
  # 1500 s outer timeout: bench.py's own global deadline is 1080 s and
  # emits a structured JSON line on expiry; the outer timeout only guards
  # scripts without their own watchdog
  timeout 1500 "$@" >> "/tmp/benchlogs/$name.log" 2>&1
  echo "=== $name: exit $? ($(date +%H:%M:%S)) ==="
}

run probe       python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones(3))))"
run bench       python bench.py
# second run from a fresh process: verifies the persistent compile cache
# is actually hit (warmup must be much faster than the first run's)
run bench2      python bench.py
run nystroem    python scripts/nystroem_recheck.py
run ls_time_d2  python scripts/ls_time_bench.py 2
run ls_time_d20 python scripts/ls_time_bench.py 20
run smc         python scripts/smc_bench.py
run smc_laplace python scripts/smc_bench.py laplace
run baseline    python scripts/baseline_matrix.py
run nuts        python scripts/nuts_bench.py
run nuts_c128   python scripts/nuts_bench.py 100000 5000 60 60 128
run time        python scripts/time_bench.py
run predict     python scripts/predict_bench.py
run tpu_tests   env MELLON_TPU_TESTS=1 python -m pytest tests/test_tpu_contracts.py -m tpu -q
run atlas       python scripts/atlas_bench.py
echo "=== campaign complete ($(date +%H:%M:%S)) ==="
