#!/bin/bash
# Round-5 CPU queue: after the full-scale CFG-4 run releases the host,
# run the CFG-3 k=21 full-scale oracle pin (VERDICT r5 item 6).
set -u
cd /root/repo
while pgrep -f "ga-tpu accept 4" > /dev/null 2>&1; do sleep 30; done
echo "=== cfg3 k21 oracle pin $(date -u +%H:%M:%S) ===" >&2
GA_PLATFORM=cpu timeout 28800 python tools/pin_cfg3_k21_oracle.py 21 \
  >> tools/r5_cpu_queue.log 2>&1
echo "cpu queue done $(date -u +%H:%M:%S)" >&2
