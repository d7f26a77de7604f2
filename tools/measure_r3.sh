#!/bin/bash
# Round-3 TPU measurement battery. Run when the tunnel is up:
#   nohup tools/measure_r3.sh > /tmp/measure_r3.log 2>&1 &
# Each stage is independently timed out; results append to the log.
cd "$(dirname "$0")/.." || exit 1
set -x

# 1. tracked headline (the round-3 tier) — decision-critical first
LEXLS_BENCH_MODE=tracked LEXLS_BENCH_SECONDARY=0 \
  timeout 3600 python bench.py --worker

# 2. fused headline (round-2 tier, warm cache) for comparison
LEXLS_BENCH_MODE=fused LEXLS_BENCH_SECONDARY=0 \
  timeout 1800 python bench.py --worker

# 3. on-TPU golden validation, fused + tracked (VERDICT r2 item 4)
timeout 2400 python tools/golden_fused_tpu.py
LEXLS_GOLDEN_MODE=tracked timeout 2400 python tools/golden_fused_tpu.py

# 4. secondary configs (equality, cold inequality, deep regularized)
timeout 3600 python -c "import bench_extra; bench_extra.run_all()"

# 5. config-2/3 on the round-2 modes for comparison
LEXLS_BENCH_COLD_MODE=fused LEXLS_BENCH_REG_MODE=xla \
  timeout 2400 python -c "import bench_extra; bench_extra.run_all()"
