#!/bin/bash
# Round-5 campaign, wave 4 (post-31fba1d code): the two tail levers on
# top of the 58.3K default (cap=1, ns=3, B=384) — slab handover
# (hslab=192: permutes/kernel-grid/bootstrap shrink to the slab) and
# iterative tail compaction (compact_rounds=2 with MXU permutes,
# unmeasured since the round-2 tunnel outage).
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

run hslab192  LEXLS_BENCH_HANDOVER_SLAB=192
run cr2       LEXLS_BENCH_COMPACT_ROUNDS=2
wait
echo "wave4 done" > tools/r5logs/campaign4_done
