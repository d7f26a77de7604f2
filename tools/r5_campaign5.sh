#!/bin/bash
# Round-5 campaign, wave 5: the op-merged build (cert-reduce hoisted out
# of the NS passes, [Q; rinv] single matmul) at the 58.3K default
# config, and trip1_noext (skip the greedy extension on the nochg trip;
# drift-induced rank growth falls back to the kernel) on top.
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

run w5_merged  LEXLS_BENCH_DUMMY=0
run w5_noext   LEXLS_BENCH_TRIP1_NOEXT=1
wait
echo "wave5 done" > tools/r5logs/campaign5_done
