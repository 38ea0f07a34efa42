#!/bin/sh
# Round-5 serial TPU measurement queue (ONE process at a time).
set -x
cd /root/repo
# SSIM conv precision A/B: highest (new default, reference-parity f32)
# vs the old single-bf16-pass DEFAULT
DTYPE=float32 REMAT=0 PAIRS=2.0 python scripts/dev_trainstep_bench.py > /tmp/r5_ssimhi.log 2>&1
GD_SSIM_PREC=default DTYPE=float32 REMAT=0 PAIRS=2.0 python scripts/dev_trainstep_bench.py > /tmp/r5_ssimdflt.log 2>&1
# B=3 reference-scale step, r4 recipe, with the r5 loss/budget fixes
B=3 ACCUM=2 REMAT=1 DTYPE=bfloat16 PAIRS=3.0 python scripts/dev_trainstep_bench.py > /tmp/r5_b3.log 2>&1
# 2DGS flagship step
RENDERER=2dgs DTYPE=bfloat16 REMAT=0 PAIRS=3.0 python scripts/dev_trainstep_bench.py > /tmp/r5_2dgs.log 2>&1
# surfel fwd-kernel roofline (stripped stages)
python scripts/dev_surfel_break.py > /tmp/r5_surfel_break.log 2>&1
# surfel bench on the new default (overflow-free) scene
BACKENDS=pallas PARITY=0 python scripts/dev_surfel_bench.py > /tmp/r5_surfel_bench.log 2>&1
# headline render bench confirm
python bench.py > /tmp/r5_bench_final.log 2>&1
# bench-step device trace for the floor-table reconciliation (VERDICT #5)
python scripts/dev_trace_names.py > /tmp/r5_bench_trace.log 2>&1
echo QUEUE_DONE
