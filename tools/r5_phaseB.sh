#!/bin/bash
# Round-5 phase B: same-session bench A/Bs of the gated experiments.
# IDLE HOST ONLY. Each line is one fresh-process bench (BENCH_SECONDARY=0
# so exactly one config is timed per run; transport tripwire stays on).
cd /root/repo || exit 1
run() {
  echo "=== $* ==="
  env BENCH_SECONDARY=0 "$@" timeout 3000 python bench.py
}
# default scene ladder
run                                             # HEAD baseline
run HIKARI_PREPASS=on
run HIKARI_SPLIT=2
run HIKARI_KEY_OBITS=6
run HIKARI_TREELET=512
run BENCH_SAMP_BATCH=8
# mesh scene ladder
run BENCH_SCENE=mesh
run BENCH_SCENE=mesh HIKARI_PREPASS=on
run BENCH_SCENE=mesh HIKARI_TREELET=512
run BENCH_SCENE=mesh HIKARI_TREELET=1024
run BENCH_SCENE=mesh HIKARI_SUB=4
run BENCH_SCENE=mesh HIKARI_SPLIT=2
# volumetric records (VERDICT r4 item 4)
run BENCH_SCENE=fog
run BENCH_SCENE=cloud
echo "=== phase B done ==="
