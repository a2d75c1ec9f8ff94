#!/bin/bash
# Round-3 follow-up measurements (run AFTER run_all_benches.sh completes;
# never run two TPU processes concurrently).
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
  timeout 1800 "$@" >> "/tmp/benchlogs/$name.log" 2>&1
  echo "=== $name: exit $? ($(date +%H:%M:%S)) ==="
}

run probe2          python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones(3))))"
# first run died to a relay-internal error mid-suite; retry
run tpu_tests2      env MELLON_TPU_TESTS=1 python -m pytest tests/test_tpu_contracts.py -m tpu -q
run debug_ls_time   python scripts/debug_ls_time_nan.py
run profile_nystroem python scripts/profile_nystroem.py
run nystroem2       python scripts/nystroem_recheck.py
run smc2            python scripts/smc_bench.py
run ls_time_d2b     python scripts/ls_time_bench.py 2
run ls_time_d20b    python scripts/ls_time_bench.py 20
# ESS/s + roofline at the chain widths of the north-star table
run nuts_c8         python scripts/nuts_bench.py 100000 5000 60 60 8
run nuts_c32        python scripts/nuts_bench.py 100000 5000 60 60 32
run nuts_c128       python scripts/nuts_bench.py 100000 5000 60 60 128
