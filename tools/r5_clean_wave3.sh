#!/bin/bash
# Clean remeasure, wave 3 (strictly sequential, after wave 2): is a
# second tracker trip worth it at the ns=2/noext optimum, where the
# kernel tail is larger than at ns=3?
set -u
cd "$(dirname "$0")/.."
mkdir -p tools/r5logs
export LEXLS_BENCH_MODE=tracked LEXLS_BENCH_SECONDARY=0
export XLA_PYTHON_CLIENT_PREALLOCATE=false

run() { # name extra-env...
  local name=$1; shift
  env "$@" timeout 5400 python bench.py --worker \
    > "tools/r5logs/clean_${name}.log" 2>&1
  echo "rc=$?" >> "tools/r5logs/clean_${name}.log"
}

while [ ! -f tools/r5logs/clean2_done ]; do sleep 30; done

run cap2_ns2  LEXLS_BENCH_NS_ITERS=2 LEXLS_BENCH_LOOP_CAP=2
echo "clean wave3 done" > tools/r5logs/clean3_done
