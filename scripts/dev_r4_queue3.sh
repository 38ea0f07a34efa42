#!/bin/sh
# Round-4 serial TPU queue #3: train-step rows (VERDICT asks #2, #4, #7)
# + one kernel-precision A/B.  ONE TPU process at a time; no timeouts.
set -x
cd /root/repo
echo "=== flagship step B=1 (refresh + samples/s row) ==="
B=1 REMAT=0 PAIRS=2.0 python scripts/dev_trainstep_bench.py
echo "=== flagship step B=3 ACCUM=2 REMAT=1 (reference scale) ==="
B=3 ACCUM=2 REMAT=1 PAIRS=2.0 python scripts/dev_trainstep_bench.py
echo "=== flagship step B=1 2DGS ==="
B=1 REMAT=0 PAIRS=2.0 RENDERER=2dgs python scripts/dev_trainstep_bench.py
echo "=== bench GD_MM_PREC=high (kernel matmul 3-pass A/B) ==="
GD_MM_PREC=high python bench.py
echo "=== QUEUE3 DONE ==="
