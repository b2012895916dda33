#!/bin/bash
# Hardware measurement sequence for when the TPU tunnel is up.
# Usage: tools/hw_measure.sh [outdir]   (default /tmp/hw_r2)
# Order matters: consistency first (correctness pin), then the bench
# (the scored number), then microbenches and A/B sweeps.
#
# RULE: the measurement host has ONE CPU core. Never run any other
# process (tests, builds, editors' language servers) while a bench is in
# flight — host contention silently deflates Mray/s 2-5x while per-run
# spreads stay tight (round-3 postmortem: identical code measured 3.151
# contended vs 5.033 idle; PERF.md "single-core host contention").
set -u
OUT=${1:-/tmp/hw_r2}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  # generous cap: remote TPU compiles alone can take 30+ min, and the
  # resident cascade multiplies the traced bounce body ~4x
  timeout 5400 "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? (log: $OUT/$name.log)"
  tail -3 "$OUT/$name.log"
}

run consistency python -u tools/check_tpu_consistency.py
run resident_check python -u tools/check_resident_hw.py
run bench_default python -u bench.py
# (env prefixes go through `env` so they can't leak into the `run`
# function's shell environment across A/Bs)
# A/B: resident sorted-compacted bounce loop (default 'auto' = on)
run bench_nonresident env HIKARI_RESIDENT=off python -u bench.py
# A/B: cascade depth (compile-time vs live-lane tracking granularity)
run bench_res_lv2 env HIKARI_RESIDENT_LEVELS=2 python -u bench.py
run prof_closest python -u tools/prof_closest_mini.py
# A/B: banded sweep band fraction
run bench_band015 env HIKARI_BAND_FRAC=0.15 python -u bench.py
# A/B: treelet size under the bit-packed kernel (resets pair chunking)
run bench_tt512 env HIKARI_TREELET=512 python -u bench.py
run bench_tt1024 env HIKARI_TREELET=1024 python -u bench.py
# A/B: ray-tile height (tighter frusta vs per-op overhead)
run bench_rt512 env HIKARI_RAY_TILE=512 python -u bench.py
# media bench config sensitivity to stochastic trilinear
run bench_fog env BENCH_SCENE=fog python -u bench.py
run bench_fog_exact env BENCH_SCENE=fog HIKARI_STOCH_TRILERP=0 python -u bench.py
# per-depth marginal cost decomposition (10 compiles — keep it last)
run prof_step python -u tools/prof_step.py
echo "all logs in $OUT"
