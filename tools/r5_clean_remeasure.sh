#!/bin/bash
# Round-5 clean re-measurement: the wave campaigns' concurrent compiles
# could execute on-device during a peer's measurement (the exclusive
# flock covered only measurements), inflating short-T medians and
# deflating slopes — the 4.34 ms/88.4K reading reproduced solo at
# 7.53 ms.  Re-measure the decision-critical configs STRICTLY
# SEQUENTIALLY (one process at a time, nothing else on the device).
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

run noext1          LEXLS_BENCH_DUMMY=0
run noext0          LEXLS_BENCH_TRIP1_NOEXT=0
run noext1_ns2      LEXLS_BENCH_NS_ITERS=2
run noext1_cap0     LEXLS_BENCH_LOOP_CAP=0
run noext1_again    LEXLS_BENCH_DUMMY=1
echo "clean remeasure done" > tools/r5logs/clean_done
