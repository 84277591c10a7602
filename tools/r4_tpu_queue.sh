#!/bin/bash
# Round-4 TPU measurement queue (dev tool; run when the chip is free).
#   1. relaxed vs canonical MSM A/B at 2^20
#   2. warm the XLA cache with one prove per ladder size (16..22)
#   3. the first-ever 2^24 prove (validates the HBM work + warms cache)
# Logs to /tmp/r4_queue.log; each step is timeout-guarded so a wedged
# tunnel cannot hold the queue forever.
set -x
cd "$(dirname "$0")/.."

echo "=== A/B: relaxed (default) ==="
timeout 2400 python tools/msm_ablate.py 20 2 2>&1 | grep -v WARNING
echo "=== A/B: canonical (RSTPU_RELAXED=0) ==="
RSTPU_RELAXED=0 timeout 2400 python tools/msm_ablate.py 20 2 2>&1 \
    | grep -v WARNING | head -4

echo "=== warm 2^16..2^22 ==="
timeout 3600 python tools/warm_cache.py 16 18 20 22
echo "=== warm 2^24 (first full-scale prove) ==="
timeout 5400 python tools/warm_cache.py 24
