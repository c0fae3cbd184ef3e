#!/bin/bash
# Round-5 session-2 chip phase B (after the quiet-host p1 headline):
#  (a) second-process 40 Mb run — cross-process compile-cache evidence,
#  (b) CFG-5 circular full scale on-chip (re-capturing the lost artifact,
#      now with the vectorized rotation + cycle-aware ranking),
#  (c) a local bench.py capture (bench_r5_local.json cited in RESULTS).
# CPU-mesh acceptance runs start concurrently 4 min in; device-stage
# walls are stable under host contention (measured, RESULTS variance
# section) — host-side stage walls in (b)/(c) carry contention.
set -u
cd /root/repo
LOG=tools/r5b_chip_B.log
echo "=== B: run_large40 p2 $(date -u +%H:%M:%S) ===" >> $LOG
GA_RL_REPS=2 timeout 1800 python tools/run_large.py 40 25 31 \
  > tools/r5_run_large40_p2.json 2>>$LOG
echo "=== B: cfg5 circular full $(date -u +%H:%M:%S) ===" >> $LOG
GA_ACCEPT_WARM=1 timeout 2400 python -m genome_assembler_tpu.cli accept 5 \
  > tools/r5_cfg5_full.json 2>>$LOG
echo "=== B: bench local $(date -u +%H:%M:%S) ===" >> $LOG
timeout 2400 python bench.py > tools/bench_r5_local.json 2>>$LOG
echo "phase B done rc=$? $(date -u +%H:%M:%S)" >> $LOG
