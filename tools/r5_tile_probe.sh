#!/bin/bash
# Final clean probes: kernel tile size for the straggler TAIL at the
# committed default (cap=1, ns=2, noext).  Round-2's tile=32/96 data
# measured the FULL-kernel mode; the tail's straggler population is
# smaller and pre-compacted, so the optimum could differ.  Strictly
# sequential.
set -u
cd "$(dirname "$0")/.."
export LEXLS_BENCH_MODE=tracked LEXLS_BENCH_SECONDARY=0
export XLA_PYTHON_CLIENT_PREALLOCATE=false

run() { # name extra-env...
  local name=$1; shift
  env "$@" timeout 3000 python bench.py --worker \
    > "tools/r5logs/clean_${name}.log" 2>&1
  echo "rc=$?" >> "tools/r5logs/clean_${name}.log"
}

run tile32  LEXLS_BENCH_TILE=32
run tile96  LEXLS_BENCH_TILE=96 LEXLS_BENCH_VMEM_MB=110
echo done > tools/r5logs/tile_probe_done
