#!/bin/bash
# Clean remeasure, wave 2 (strictly sequential): settle ns at
# trip1_noext=1/cap=1 — clean ns2 (55.5K) beat clean ns3 (50.0K), so
# try ns1 and repeat ns2 for stability.
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

# wait for the first clean wave to fully finish
while [ ! -f tools/r5logs/clean_done ]; do sleep 30; done

run ns1         LEXLS_BENCH_NS_ITERS=1
run ns2_again   LEXLS_BENCH_NS_ITERS=2
echo "clean wave2 done" > tools/r5logs/clean2_done
