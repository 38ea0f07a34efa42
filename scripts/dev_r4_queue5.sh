#!/bin/sh
# Round-4 serial TPU queue #5: B=3 retry after the _downsample2 OOM fix,
# surfel backward trace, headline re-confirm.
set -x
cd /root/repo
echo "=== flagship step B=3 ACCUM=2 REMAT=1 bf16 PAIRS=3.0 (retry, loss fix) ==="
B=3 ACCUM=2 REMAT=1 PAIRS=3.0 DTYPE=bfloat16 python scripts/dev_trainstep_bench.py
echo "=== surfel fwd+bwd device trace ==="
python scripts/dev_surfel_trace.py
echo "=== bench re-confirm (default path unchanged) ==="
python bench.py
echo "=== QUEUE5 DONE ==="
