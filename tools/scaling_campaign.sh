#!/bin/bash
# Load-gated scaling-attempt campaign: bank north-rule attempts while
# the host is quiet. Alternates 3x 8x32 : 1x 2x8. Stop with:
#   touch /tmp/stop_campaign
cd /root/repo
i=0
while [ ! -f /tmp/stop_campaign ]; do
  load=$(cut -d' ' -f1 /proc/loadavg)
  if python -c "import sys; sys.exit(0 if float('$load') < 1.5 else 1)"; then
    if [ $((i % 4)) -eq 3 ]; then pair=2x8; else pair=8x32; fi
    python bench.py --scaling --scaling-pair $pair >/dev/null 2>&1
    i=$((i+1))
    sleep 130   # let loadavg decay below the gate before re-checking
  else
    sleep 20
  fi
done
echo "campaign done: $i attempts"
