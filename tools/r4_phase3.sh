#!/bin/bash
# Round-4 phase 3: hardware A/B of the tile-resident sweep (grid over
# ray tiles, in-kernel double-buffered pair loop, early-out as a loop
# BREAK), reversed NEE shadow rays, and the Newton-reciprocal epilogue.
# Consistency first: the tile kernels' Mosaic lowering (DMA in a
# while_loop) must be semantics-checked on the chip before any timing.
# Idle host required.
set -u
OUT=${1:-/tmp/r4p3}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 4200 "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? (log: $OUT/$name.log)"
  tail -2 "$OUT/$name.log"
}

run consistency_tile env HIKARI_SWEEP=tile HIKARI_SHADOW_REV=on \
  python -u tools/check_tpu_consistency.py
run bench_tile env HIKARI_SWEEP=tile python -u bench.py
run bench_tile_rev env HIKARI_SWEEP=tile HIKARI_SHADOW_REV=on \
  python -u bench.py
run bench_rev env HIKARI_SHADOW_REV=on python -u bench.py
run bench_tile_newton env HIKARI_SWEEP=tile HIKARI_RECIP=newton \
  python -u bench.py
echo "phase3 done; logs in $OUT"
