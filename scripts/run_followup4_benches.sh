#!/bin/bash
# Round-3 follow-up #4: final ls_time table cells with the matmul-form
# host-rescue rebuild (each mode in its own subprocess).
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/benchlogs
HASH="$(git rev-parse --short HEAD 2>/dev/null || echo unknown)"
run() {
  name="$1"; shift
  echo "=== $name: $* (started $(date +%H:%M:%S)) ==="
  { echo "commit: $HASH"; echo "cmd: $*"; echo "started: $(date -Is)"; } > "/tmp/benchlogs/$name.log"
  timeout 1800 "$@" >> "/tmp/benchlogs/$name.log" 2>&1
  echo "=== $name: exit $? ($(date +%H:%M:%S)) ==="
}
run ls_time_d20d    python scripts/ls_time_bench.py 20
run ls_time_d2c     python scripts/ls_time_bench.py 2
