#!/bin/bash
# Round-5 session-2 CPU-mesh queue: the two full-scale provenance runs
# the prior session queued but never executed (VERDICT r4 items 4-5):
#  (a) CFG-4 at its defined scale (12 Mb x 100x) on the 8-device mesh,
#  (b) CFG-6 (16-chromosome yeast-like) at full scale.
# Started while the chip p1 sat in its cold-compile lottery (host idle);
# contention with chip-run host stages is the documented, bounded effect.
set -u
cd /root/repo
LOG=tools/r5b_cpu.log
sleep 10
echo "=== CPU: cfg4 full scale $(date -u +%H:%M:%S) ===" >> $LOG
env GA_PLATFORM=cpu JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 GA_ACCEPT_SCALE=1.0 \
  timeout 2400 python -m genome_assembler_tpu.cli accept 4 \
  > tools/r5_cfg4_full.json 2>tools/r5_cfg4_full.log
echo "cfg4 rc=$? $(date -u +%H:%M:%S)" >> $LOG
echo "=== CPU: cfg6 full scale $(date -u +%H:%M:%S) ===" >> $LOG
env GA_PLATFORM=cpu JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 GA_ACCEPT_SCALE=1.0 \
  timeout 2400 python -m genome_assembler_tpu.cli accept 6 \
  > tools/r5_cfg6_full.json 2>tools/r5_cfg6_full.log
echo "cfg6 rc=$? $(date -u +%H:%M:%S)" >> $LOG
echo "cpu queue done $(date -u +%H:%M:%S)" >> $LOG
