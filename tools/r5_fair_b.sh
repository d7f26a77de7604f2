#!/bin/bash
# Fair cross-B comparison on the B-independent drift realization
# (strictly sequential).  Compiles are value-independent (cached).
set -u
cd "$(dirname "$0")/.."
mkdir -p tools/r5logs
export LEXLS_BENCH_MODE=tracked LEXLS_BENCH_SECONDARY=0
export XLA_PYTHON_CLIENT_PREALLOCATE=false

run() { # name extra-env...
  local name=$1; shift
  env "$@" timeout 5400 python bench.py --worker \
    > "tools/r5logs/fair_${name}.log" 2>&1
  echo "rc=$?" >> "tools/r5logs/fair_${name}.log"
}

run B384   LEXLS_BENCH_DUMMY=0
run B448   LEXLS_BENCH_B=448
run B384b  LEXLS_BENCH_DUMMY=1
run B448b  LEXLS_BENCH_B=448 LEXLS_BENCH_DUMMY=1
echo done > tools/r5logs/fair_done
