#!/bin/bash
# Round-4 phase 4: tune the tile-resident sweep (phase-3 winner) —
# treelet size and ray-tile size interact differently when the pair
# walk is an in-kernel loop (per-pair grid overhead gone, DMA per
# treelet block instead). Then record the mesh-heavy scanned-asset
# scene with the winning config. Idle host required.
set -u
OUT=${1:-/tmp/r4p4}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 4200 "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? (log: $OUT/$name.log)"
  tail -2 "$OUT/$name.log"
}

run bench_tile_tt512 env HIKARI_SWEEP=tile HIKARI_TREELET=512 \
  python -u bench.py
run bench_tile_rt1024 env HIKARI_SWEEP=tile HIKARI_RAY_TILE=1024 \
  python -u bench.py
run bench_tile_rt256 env HIKARI_SWEEP=tile HIKARI_RAY_TILE=256 \
  python -u bench.py
run bench_mesh env BENCH_SCENE=mesh HIKARI_SWEEP=tile python -u bench.py
echo "phase4 done; logs in $OUT"
