#!/bin/bash
# Round-5 phase 4: wait for phases 2+3, then
#  (a) re-locate the flat/bucketed crossover with the accum default
#      (accum shifted the bucketed cost curve ~1.54x down at 40 Mb, so
#      the 2^25-row threshold measured for per-batch merging in r4 may
#      now be too high),
#  (b) refresh the 40 Mb beyond-baseline run with repeated warm passes
#      (p1) + a second process (p2) — the spell/simplify variance
#      investigation (VERDICT r5 item 8),
#  (c) CFG-3 full-scale warm re-time with shipped defaults,
#  (d) CFG-5 (circular E. coli) full scale on the chip,
#  (e) a local bench.py capture.
set -u
cd /root/repo
while pgrep -f "r5_chip_phase23.sh" > /dev/null 2>&1; do sleep 20; done
LOG=tools/r5_chip_phase4.log
OUT=tools/r5_crossover_accum.jsonl
: > "$OUT"
echo "=== phase4a crossover $(date -u +%H:%M:%S) ===" >&2
for mb in 4.6 7 10 14; do
  for b in 0 1; do
    line=$(env GA_BUCKETED=$b GA_BUCKET_ACCUM=4 \
      timeout 3600 python tools/measure_count_stage.py $mb 25 31 2 2>>$LOG)
    echo "{\"mb\": $mb, \"bucketed\": $b, \"r\": ${line:-null}}" >> "$OUT"
  done
done
echo "=== phase4b run_large40 p1 $(date -u +%H:%M:%S) ===" >&2
GA_RL_REPS=3 timeout 5400 python tools/run_large.py 40 25 31 \
  > tools/r5_run_large40_p1.json 2>>$LOG
echo "=== phase4b run_large40 p2 $(date -u +%H:%M:%S) ===" >&2
GA_RL_REPS=2 timeout 3600 python tools/run_large.py 40 25 31 \
  > tools/r5_run_large40_p2.json 2>>$LOG
echo "=== phase4c cfg3 warm $(date -u +%H:%M:%S) ===" >&2
GA_ACCEPT_WARM=1 timeout 10800 python -m genome_assembler_tpu.cli accept 3 \
  > tools/r5_cfg3_full_warm.json 2>>$LOG
echo "=== phase4d cfg5 circular full $(date -u +%H:%M:%S) ===" >&2
GA_ACCEPT_WARM=1 timeout 7200 python -m genome_assembler_tpu.cli accept 5 \
  > tools/r5_cfg5_full.json 2>>$LOG
echo "=== phase4e bench local $(date -u +%H:%M:%S) ===" >&2
timeout 5400 python bench.py > tools/bench_r5_local.json 2>>$LOG
echo "phase4 done $(date -u +%H:%M:%S)" >&2
