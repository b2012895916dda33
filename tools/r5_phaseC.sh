#!/bin/bash
# Round-5 phase C: combine the phase-B winner (KEY_OBITS=6, +13% default)
# with the remaining candidates; clean SPLIT=2 (K=16) after the phase-B
# torn-state junk run. IDLE HOST ONLY.
cd /root/repo || exit 1
run() {
  echo "=== $* ==="
  env BENCH_SECONDARY=0 "$@" timeout 3000 python bench.py
}
run HIKARI_KEY_OBITS=7
run HIKARI_KEY_OBITS=6 HIKARI_SPLIT=2
run HIKARI_KEY_OBITS=6 HIKARI_RAY_TILE=2048
run HIKARI_KEY_OBITS=6 HIKARI_SUB=16
run BENCH_SCENE=mesh HIKARI_KEY_OBITS=6
run BENCH_SCENE=mesh HIKARI_KEY_OBITS=7
run BENCH_SCENE=mesh HIKARI_KEY_OBITS=6 HIKARI_SUB=16

# cloud crash bisect: does lane count (K) drive the 400/800px worker crash?
run BENCH_SCENE=cloud BENCH_RES=400 BENCH_SAMP_BATCH=1 BENCH_ITERS=2
echo "=== phase C done ==="
