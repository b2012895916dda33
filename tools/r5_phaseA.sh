#!/bin/bash
# Round-5 phase A: fresh profiles at the shipping config (SWEEP=tile,
# RECIP=newton, RT=1024, TT=256), default AND mesh scenes — VERDICT r4
# item 2. Run on an IDLE host (single-core: nothing else may run).
cd /root/repo || exit 1
echo "=== pairscale default ==="
timeout 2400 python tools/prof_pairscale.py
echo "=== pairscale mesh ==="
BENCH_SCENE=mesh timeout 2400 python tools/prof_pairscale.py
echo "=== prof_step default ==="
timeout 3600 python tools/prof_step.py 800
echo "=== prof_step mesh ==="
BENCH_SCENE=mesh timeout 3600 python tools/prof_step.py 800
echo "=== prof_closest_mini default ==="
timeout 3600 python tools/prof_closest_mini.py
echo "=== prof_closest_mini mesh ==="
BENCH_SCENE=mesh timeout 3600 python tools/prof_closest_mini.py
echo "=== phase A done ==="
