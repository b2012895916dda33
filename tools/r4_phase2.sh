#!/bin/bash
# Round-4 phase 2: validate the TILE_SHIFT=16 pair-meta rebalance on
# hardware, then a same-session samp_batch ladder (1 / 2 / 4) at the
# shipping RAY_TILE=512. The 20-bit shift capped dispatches at 2047
# tiles, so 800^2 x samp_batch=2 at RAY_TILE=512 (2500 tiles) died with
# "TPU backend error (Internal)" — and samp_batch=4 at RAY_TILE=1024
# (2500 tiles) died the same way in round 3 (misdiagnosed as a program-
# size limit). Idle host required.
set -u
OUT=${1:-/tmp/r4p2}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 4200 "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? (log: $OUT/$name.log)"
  tail -2 "$OUT/$name.log"
}

run consistency python -u tools/check_tpu_consistency.py
run bench_default python -u bench.py
run bench_samp4 env BENCH_SAMP_BATCH=4 python -u bench.py
run bench_samp1 env BENCH_SAMP_BATCH=1 python -u bench.py
# fresh per-stage profile at the new HEAD (VERDICT r3 item 7)
run prof_step python -u tools/prof_step.py
run prof_closest python -u tools/prof_closest_mini.py
echo "phase2 done; logs in $OUT"
