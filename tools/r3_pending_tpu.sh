#!/usr/bin/env bash
# Pending on-chip measurements queued behind the r3 tunnel outage. Run once
# when `python -c "import jax; jax.devices()"` responds. Each step prints one
# JSON line; everything is compilation-cached for the driver's end-of-round
# bench run.
set -uo pipefail
cd "$(dirname "$0")/.."

echo "== 1/3 bench extras flow at tiny shapes (validates the r3 refactor) =="
BENCH_BATCH=2 BENCH_K=2 BENCH_HW=84 BENCH_ITERS=3 timeout 3000 python bench.py

echo "== 2/3 TOKEN-SPACE train step at the production operating point =="
BENCH_TRAIN=1 BENCH_TOKENS=1 timeout 3000 python bench.py

echo "== 3/3 full default bench (headline + serving + train extras) =="
timeout 5400 python bench.py
