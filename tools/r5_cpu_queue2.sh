#!/bin/bash
# Round-5 CPU queue 2: after queue 1 (CFG-3 k21 oracle pin) finishes,
# run the full-scale 16-chromosome CFG-6 acceptance on the 8-device CPU
# mesh (VERDICT r5 item 5 at its defined scale).
set -u
cd /root/repo
while pgrep -f "r5_cpu_queue.sh" > /dev/null 2>&1; do sleep 30; done
echo "=== cfg6 full scale $(date -u +%H:%M:%S) ===" >&2
env GA_PLATFORM=cpu JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 GA_ACCEPT_SCALE=1.0 \
  timeout 21600 nice -n 10 python -m genome_assembler_tpu.cli accept 6 \
  > tools/r5_cfg6_full.json 2>tools/r5_cfg6_full.log
echo "cpu queue2 done $(date -u +%H:%M:%S) rc=$?" >&2
