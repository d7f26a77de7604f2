#!/bin/bash
# Round-5 campaign, wave 3: around the 58.3K record (loop_cap=1, ns=3,
# B=384).  Does a 4th NS pass keep paying (cap1_ns4)?  Does batch
# scaling turn positive at the higher accept rate (cap1_ns3_B512)?
# Plus a clean cold-config-2 re-measure at B=2048 (the earlier 1515/s
# at B=1024 overlapped wave-2 compile executions).
set -u
cd "$(dirname "$0")/.."
mkdir -p tools/r5logs
export LEXLS_BENCH_LOCK=/tmp/lexls_bench.lock
export XLA_PYTHON_CLIENT_PREALLOCATE=false

run() { # name extra-env...
  local name=$1; shift
  ( export "$@" 2>/dev/null
    timeout 5400 python bench.py --worker \
      > "tools/r5logs/cfg_${name}.log" 2>&1
    echo "rc=$?" >> "tools/r5logs/cfg_${name}.log" ) &
}

export LEXLS_BENCH_MODE=tracked LEXLS_BENCH_SECONDARY=0
run cap1_ns4       LEXLS_BENCH_NS_ITERS=4
run cap1_ns3_B512  LEXLS_BENCH_B=512
( export LEXLS_BENCH_ONLY=2 LEXLS_BENCH_COLD_B=2048
  timeout 5400 python bench_extra.py \
    > tools/r5logs/cfg_cold2_B2048.log 2>&1
  echo "rc=$?" >> tools/r5logs/cfg_cold2_B2048.log ) &
wait
echo "wave3 done" > tools/r5logs/campaign3_done
