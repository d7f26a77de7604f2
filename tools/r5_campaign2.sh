#!/bin/bash
# Round-5 campaign, wave 2: push past the 45.1K record
# (loop_cap=1, no pyramid, ns=2, B=384 — now the bench default).
# Next most informative configs: does a 3rd NS pass raise the tracker
# accept rate enough to beat the kernel tail (cap1_ns3)?  does
# throughput scale with batch (cap1_B512)?  is one absorption-bearing
# second trip worth it (cap2)?
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

run cap1_ns3   LEXLS_BENCH_NS_ITERS=3
run cap1_B512  LEXLS_BENCH_B=512
run cap2       LEXLS_BENCH_LOOP_CAP=2
wait
echo "wave2 done" > tools/r5logs/campaign2_done
