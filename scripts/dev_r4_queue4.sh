#!/bin/sh
# Round-4 serial TPU queue #4: reference-protocol (bf16-mixed) step rows
# with an overflow-free pair budget (VERDICT ask #2 wants overflow==0),
# plus surfel chained re-measures (Xg hoist + comparable-scene row).
set -x
cd /root/repo
echo "=== flagship step B=1 bf16 PAIRS=3.0 ==="
B=1 REMAT=0 PAIRS=3.0 DTYPE=bfloat16 python scripts/dev_trainstep_bench.py
echo "=== flagship step B=3 ACCUM=2 REMAT=1 bf16 PAIRS=3.0 (reference scale) ==="
B=3 ACCUM=2 REMAT=1 PAIRS=3.0 DTYPE=bfloat16 python scripts/dev_trainstep_bench.py
echo "=== flagship step B=1 2DGS bf16 PAIRS=3.0 ==="
B=1 REMAT=0 PAIRS=3.0 DTYPE=bfloat16 RENDERER=2dgs python scripts/dev_trainstep_bench.py
echo "=== surfel chained, 3dgs-comparable scene (overflow-free) ==="
BACKENDS=pallas PARITY=0 SCALES=3dgs python scripts/dev_surfel_bench.py
echo "=== surfel chained, default scene (Xg-hoist delta vs 41.5) ==="
BACKENDS=pallas PARITY=0 python scripts/dev_surfel_bench.py
echo "=== QUEUE4 DONE ==="
