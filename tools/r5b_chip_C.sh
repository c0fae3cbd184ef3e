#!/bin/bash
# Round-5 session-2 chip phase C (after bench):
#  (a) clean nb=1024 vs nb=2048 head-to-head at the 40 Mb count shape
#      (the prior session's sweep measured 1024 ahead of 256 but 2048
#      was picked by the auto rule from a contended extension; settle it),
#  (b) CFG-3 full-scale warm re-time with shipped defaults (flat side of
#      the 26.2M-row threshold; k=21/31/41).
set -u
cd /root/repo
LOG=tools/r5b_chip_C.log
OUT=tools/r5_nb_headtohead.jsonl
: > "$OUT"
echo "=== C: nb head-to-head $(date -u +%H:%M:%S) ===" >> $LOG
for nb in 1024 2048; do
  line=$(env GA_BUCKETED=1 GA_BUCKETS=$nb GA_BUCKET_ACCUM=4 \
    timeout 3600 python tools/measure_count_stage.py 40 25 31 3 2>>$LOG)
  echo "{\"buckets\": $nb, \"r\": ${line:-null}}" >> "$OUT"
done
echo "=== C: cfg3 full warm $(date -u +%H:%M:%S) ===" >> $LOG
GA_ACCEPT_WARM=1 timeout 10800 python -m genome_assembler_tpu.cli accept 3 \
  > tools/r5_cfg3_full_warm.json 2>>$LOG
echo "phase C done rc=$? $(date -u +%H:%M:%S)" >> $LOG
