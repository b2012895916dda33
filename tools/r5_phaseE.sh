#!/bin/bash
# Round-5 phase E: per-triangle-box pre-pass A/B at the shipping key.
cd /root/repo || exit 1
run() {
  echo "=== $* ==="
  env BENCH_SECONDARY=0 "$@" timeout 3000 python bench.py
}
run HIKARI_PREPASS=on
run BENCH_SCENE=mesh HIKARI_PREPASS=on
echo "=== phase E done ==="
