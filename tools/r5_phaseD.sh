#!/bin/bash
# Round-5 phase D: mesh tile-size at the new default key; cloud-crash
# depth bisect; pre-pass clear-fraction diagnosis. IDLE HOST ONLY.
cd /root/repo || exit 1
run() {
  echo "=== $* ==="
  env BENCH_SECONDARY=0 "$@" timeout 3000 python bench.py
}
run BENCH_SCENE=mesh HIKARI_RAY_TILE=512
# cloud at 640k lanes (400^2 K=4): depth 5 vs the crashing depth 32 —
# does DEPTH or LANE COUNT drive the worker crash?
run BENCH_SCENE=cloud BENCH_RES=400 BENCH_DEPTH=5 BENCH_ITERS=2
echo "=== pairscale default (prepass diag) ==="
timeout 2400 python tools/prof_pairscale.py
echo "=== phase D done ==="
