#!/bin/bash
# Round-4 phase 1: settle the 1adf55c "regression" with same-session,
# interleaved, idle-host measurements. HEAD (new defaults) vs the two
# historical states, each running ITS OWN bench.py. Nothing else may run
# on the host while this is in flight (single-core host; see PERF.md
# round-3 "single-core host contention").
set -u
OUT=${1:-/tmp/r4p1}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  name=$1; dir=$2; shift 2
  echo "=== $name in $dir: $* ==="
  (cd "$dir" && timeout 3600 "$@") > "$OUT/$name.log" 2>&1
  echo "rc=$? (log: $OUT/$name.log)"
  tail -2 "$OUT/$name.log"
}

run consistency . python -u tools/check_tpu_consistency.py
run head_a . python -u bench.py
run hist_1adf55c .wt/a1 python -u bench.py
run hist_0d9727b .wt/b0 python -u bench.py
run head_b . python -u bench.py
echo "phase1 done; logs in $OUT"
