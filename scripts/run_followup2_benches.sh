#!/bin/bash
# Round-3 follow-up #2: verify the ridge fix on TPU and re-profile the
# nystroem fit phases with true host syncs.
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

run debug_ls_time2   python scripts/debug_ls_time_nan.py
run profile_nystroem2 python scripts/profile_nystroem.py
