#!/bin/bash
# Round-5 phases 2+3: wait for phase 1 (accum sweep) to release the chip,
# then (2) contraction-ranking probe at the 84M-row shape, (3) GA_BUCKETS
# sweep at the 40 Mb count shape with the accum default.
set -u
cd /root/repo
while pgrep -f "r5_chip_phase1.sh" > /dev/null 2>&1; do sleep 20; done
echo "=== phase2 contract probe $(date -u +%H:%M:%S) ===" >&2
timeout 5400 python tools/measure_rank_contract.py 5 6 7 \
  > tools/r5_rank_contract.jsonl 2>>tools/r5_chip_phase23.log
echo "=== phase3 buckets sweep $(date -u +%H:%M:%S) ===" >&2
OUT=tools/r5_buckets_sweep.jsonl
: > "$OUT"
for nb in 128 512 1024; do
  line=$(env GA_BUCKETED=1 GA_BUCKET_ACCUM=4 GA_BUCKETS=$nb \
    timeout 3600 python tools/measure_count_stage.py 40 25 31 2 \
    2>>tools/r5_chip_phase23.log)
  echo "{\"buckets\": $nb, \"r\": ${line:-null}}" >> "$OUT"
done
echo "phase23 done $(date -u +%H:%M:%S)" >&2
