#!/bin/bash
# Round-5 session-2 chip phase A: re-capture the 40 Mb beyond-baseline
# headline on a QUIET host (the prior session's artifact was lost
# uncommitted). p1 = cold + 3 warm reps in one process.
set -u
cd /root/repo
LOG=tools/r5b_chip_A.log
echo "=== A: run_large40 p1 $(date -u +%H:%M:%S) ===" >> $LOG
GA_RL_REPS=3 timeout 3000 python tools/run_large.py 40 25 31 \
  > tools/r5_run_large40_p1.json 2>>$LOG
echo "phase A done rc=$? $(date -u +%H:%M:%S)" >> $LOG
