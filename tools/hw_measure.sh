#!/bin/bash
# Hardware measurement sequence for when the TPU tunnel is up.
# Usage: tools/hw_measure.sh [outdir]   (default /tmp/hw_r2)
# Order matters: consistency first (correctness pin), then the bench
# (the scored number), then microbenches and A/B sweeps.
set -u
OUT=${1:-/tmp/hw_r2}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 2400 "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? (log: $OUT/$name.log)"
  tail -3 "$OUT/$name.log"
}

run consistency python -u tools/check_tpu_consistency.py
run bench_default python -u bench.py
run prof_closest python -u tools/prof_closest_mini.py
# A/B: banded sweep band fraction
HIKARI_BAND_FRAC=0.15 run bench_band015 python -u bench.py
# A/B: treelet size under the bit-packed kernel (resets pair chunking)
HIKARI_TREELET=512 run bench_tt512 python -u bench.py
HIKARI_TREELET=1024 run bench_tt1024 python -u bench.py
# A/B: ray-tile height (tighter frusta vs per-op overhead)
HIKARI_RAY_TILE=512 run bench_rt512 python -u bench.py
# media bench config sensitivity to stochastic trilinear
BENCH_SCENE=fog run bench_fog python -u bench.py
BENCH_SCENE=fog HIKARI_STOCH_TRILERP=0 run bench_fog_exact python -u bench.py
echo "all logs in $OUT"
