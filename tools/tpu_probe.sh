#!/bin/bash
# Poll the axon TPU tunnel until it answers; log transitions.
# Usage: tools/tpu_probe.sh [interval_s] [max_loops]
INTERVAL=${1:-120}
MAXLOOPS=${2:-720}
LOG=/tmp/tpu_probe.log
for i in $(seq 1 "$MAXLOOPS"); do
  if timeout 75 python -c "import jax; print(jax.devices()[0].platform)" 2>/dev/null | grep -q tpu; then
    echo "$(date -u +%FT%TZ) UP" >> "$LOG"
    exit 0
  else
    echo "$(date -u +%FT%TZ) down" >> "$LOG"
  fi
  sleep "$INTERVAL"
done
exit 1
