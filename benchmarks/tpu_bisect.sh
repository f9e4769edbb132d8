#!/bin/bash
# Round-4 regression bisect (VERDICT r3 #1): run on real TPU.
#   bash benchmarks/tpu_bisect.sh 2>&1 | tee /tmp/bisect.log
# Legs:
#   1. qwen2-only, block_size 16 (round-2 default)
#   2. qwen2-only, block_size 32 (round-3 default)
#   3. 8B-fp8-only, measured KV sizing (the r3 OOM leg)
# Each leg is a separate process (fresh HBM). Compile cache makes the
# second run of a shape ~free.
set -x
cd "$(dirname "$0")/.."

echo "=== leg 1: qwen2 block16 ==="
LVT_BENCH_SKIP_8B=1 LVT_BENCH_SKIP_ENCODE=1 LVT_BENCH_BLOCK=16 \
  timeout 1800 python bench.py 256

echo "=== leg 2: qwen2 block32 ==="
LVT_BENCH_SKIP_8B=1 LVT_BENCH_SKIP_ENCODE=1 LVT_BENCH_BLOCK=32 \
  timeout 1800 python bench.py 256

echo "=== leg 3: 8B fp8 (measured sizing) ==="
LVT_BENCH_SKIP_QWEN=1 LVT_BENCH_SKIP_ENCODE=1 LVT_BENCH_SKIP_PARITY=1 \
  timeout 2400 python bench.py 256
