#!/bin/sh
# Round-4 serial TPU queue #4: reference-protocol (bf16-mixed) step rows
# with an overflow-free pair budget (VERDICT ask #2 wants overflow==0).
set -x
cd /root/repo
echo "=== flagship step B=1 bf16 PAIRS=3.0 ==="
B=1 REMAT=0 PAIRS=3.0 DTYPE=bfloat16 python scripts/dev_trainstep_bench.py
echo "=== flagship step B=3 ACCUM=2 REMAT=1 bf16 PAIRS=3.0 (reference scale) ==="
B=3 ACCUM=2 REMAT=1 PAIRS=3.0 DTYPE=bfloat16 python scripts/dev_trainstep_bench.py
echo "=== QUEUE4 DONE ==="
