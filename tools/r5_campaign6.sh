#!/bin/bash
# Round-5 campaign, wave 6: around the 88.4K record (cap=1, ns=3,
# trip1_noext).  With the extension chain gone the trip is ~2x cheaper,
# so the ns sweet spot may have moved: ns=2 saves ~0.3-0.6 ms/trip if
# the accept rate holds; ns=4 buys accept rate if the tail still
# dominates.
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

run noext_ns2  LEXLS_BENCH_NS_ITERS=2
run noext_ns4  LEXLS_BENCH_NS_ITERS=4
wait
echo "wave6 done" > tools/r5logs/campaign6_done
