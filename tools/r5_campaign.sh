#!/bin/bash
# Round-5 tracked-tier config campaign (VERDICT r5 item 2): bisect the
# 39.3K -> 33.0K regression by measuring HEAD-code configs on TPU.
# Configs compile CONCURRENTLY (pairs) through the tunnel; the timed
# phases serialize on LEXLS_BENCH_LOCK so measurements never overlap.
# Usage: bash tools/r5_campaign.sh  (run from repo root, backgrounded)
set -u
cd "$(dirname "$0")/.."
mkdir -p tools/r5logs
export LEXLS_BENCH_MODE=tracked LEXLS_BENCH_SECONDARY=0
export LEXLS_BENCH_LOCK=/tmp/lexls_bench.lock
export XLA_PYTHON_CLIENT_PREALLOCATE=false

run() { # name extra-env...
  local name=$1; shift
  ( export "$@" 2>/dev/null
    timeout 5400 python bench.py --worker \
      > "tools/r5logs/cfg_${name}.log" 2>&1
    echo "rc=$?" >> "tools/r5logs/cfg_${name}.log" ) &
}

# pair 1: ns_iters ablation + no-pyramid
run ns1            LEXLS_BENCH_NS_ITERS=1
run noshrink       LEXLS_BENCH_SHRINK=" "
wait
# pair 2: single-trip + kernel tail, and one-slab pyramid
run cap1_noshrink  LEXLS_BENCH_SHRINK=" " LEXLS_BENCH_LOOP_CAP=1
run shrink192      LEXLS_BENCH_SHRINK=192
wait
# pair 3: combine the winners' likely components
run ns1_noshrink   LEXLS_BENCH_NS_ITERS=1 LEXLS_BENCH_SHRINK=" "
run ns1_cap1       LEXLS_BENCH_NS_ITERS=1 LEXLS_BENCH_SHRINK=" " LEXLS_BENCH_LOOP_CAP=1
wait
echo "campaign done" > tools/r5logs/campaign_done
