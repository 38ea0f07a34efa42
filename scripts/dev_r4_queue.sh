#!/bin/sh
# Round-4 serial TPU measurement queue (ONE TPU process at a time; never
# timeout-killed — killed-mid-compile claims wedge the axon tunnel).
set -x
cd /root/repo
echo "=== bench: default (re-run, noise check) ==="
python bench.py
echo "=== bench: GD_GRAD_SLAB=bf16 (VERDICT r3 weak #7 measured row) ==="
GD_GRAD_SLAB=bf16 python bench.py
echo "=== bench: BENCH_ABS=1 (abs-rows-on training backward row) ==="
BENCH_ABS=1 python bench.py
echo "=== surfel chained bench (VERDICT r3 weak #4) ==="
BACKENDS=pallas PARITY=0 python scripts/dev_surfel_bench.py
echo "=== QUEUE DONE ==="
