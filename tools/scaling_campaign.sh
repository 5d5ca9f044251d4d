#!/bin/bash
# Quiet-window scaling campaign: alternate 2x8 / 8x32 attempts while
# the 1-min load stays low; skip (sleep) when neighbors are active.
# Each attempt appends to BENCH/runs.jsonl and regenerates
# BENCH/BASELINE.md via bench.py's aggregation.
#
# Usage: tools/scaling_campaign.sh [max_attempts] [load_gate]
set -u
cd "$(dirname "$0")/.."
MAX=${1:-10}
GATE=${2:-1.5}
i=0
done_n=0
while [ "$done_n" -lt "$MAX" ]; do
  load=$(cut -d' ' -f1 /proc/loadavg)
  quiet=$(python3 -c "print(1 if $load < $GATE else 0)")
  if [ "$quiet" = "1" ]; then
    if [ $((i % 2)) = 0 ]; then pair=8x32; else pair=2x8; fi
    echo "[campaign] attempt $((done_n+1))/$MAX pair=$pair load1=$load $(date -u +%H:%M:%S)"
    python3 bench.py --scaling --scaling-pair "$pair" > /tmp/scaling_attempt_$$.log 2>&1
    tail -1 BENCH/runs.jsonl
    done_n=$((done_n+1))
    i=$((i+1))
    sleep 20   # let the load average decay before gating the next one
  else
    echo "[campaign] busy (load1=$load), waiting $(date -u +%H:%M:%S)"
    sleep 60
  fi
done
echo "[campaign] done: $done_n attempts"
