#!/bin/bash
# Round-4 perf sweep 1: handover trimming + loop_cap tuning (serialized
# on the single TPU chip).
cd "$(dirname "$0")/.."
for cfg in "2 0" "3 0" "1 0"; do
  set -- $cfg
  echo "=== tracked B=384 loop_cap=$1 compact=$2 ==="
  LEXLS_BENCH_MODE=tracked LEXLS_BENCH_LOOP_CAP=$1 LEXLS_BENCH_COMPACT=$2 \
    LEXLS_BENCH_SECONDARY=0 timeout 2400 python bench.py --worker 2>&1 \
    | grep --line-buffered -v WARNING
done
echo "=== cold config-2 B=1024 ==="
LEXLS_BENCH_COLD_B=1024 timeout 2400 python - << 'EOF' 2>&1 | grep --line-buffered -v WARNING
import bench_extra
bench_extra.bench_inequality_cold()
EOF
