#!/bin/bash
# Round-5 master queue (replaces r5_cpu_queue{,2}.sh): order the
# remaining work so chip timings get a quiet host —
#   1. wait for the chip phase-5 sweep AND the full-scale CFG-4 run,
#   2. phase 6 on the chip: re-time CFG-3 warm and CFG-5 (both were
#      contended by CFG-4's 8-device CPU mesh; CFG-5 additionally gains
#      the r5 cyclic-sampled ranking + vectorized Booth rotation),
#   3. then the CPU-heavy provenance runs: CFG-3 k21 oracle pin,
#      full-scale 16-chromosome CFG-6.
set -u
cd /root/repo
while pgrep -f "r5_chip_phase5.sh" > /dev/null 2>&1 || \
      pgrep -f "ga-tpu accept 4" > /dev/null 2>&1; do sleep 30; done
echo "=== phase6 cfg3 warm retime $(date -u +%H:%M:%S) ===" >&2
GA_ACCEPT_WARM=1 timeout 10800 python -m genome_assembler_tpu.cli accept 3 \
  > tools/r5_cfg3_full_warm_clean.json 2>tools/r5_phase6.log
echo "=== phase6 cfg5 retime $(date -u +%H:%M:%S) ===" >&2
GA_ACCEPT_WARM=1 timeout 7200 python -m genome_assembler_tpu.cli accept 5 \
  > tools/r5_cfg5_full_clean.json 2>>tools/r5_phase6.log
echo "=== cfg3 k21 oracle pin $(date -u +%H:%M:%S) ===" >&2
GA_PLATFORM=cpu timeout 28800 python tools/pin_cfg3_k21_oracle.py 21 \
  >> tools/r5_cpu_queue.log 2>&1
echo "=== cfg6 full scale $(date -u +%H:%M:%S) ===" >&2
env GA_PLATFORM=cpu JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 GA_ACCEPT_SCALE=1.0 \
  timeout 21600 python -m genome_assembler_tpu.cli accept 6 \
  > tools/r5_cfg6_full.json 2>tools/r5_cfg6_full.log
echo "master queue done $(date -u +%H:%M:%S)" >&2
