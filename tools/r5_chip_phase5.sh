#!/bin/bash
# Round-5 phase 5: extend the GA_BUCKETS sweep (128/256/512/1024 measured
# 21.4/16.8/16.5/14.5 s at the 40 Mb shape — still descending at 1024,
# consistent with the r3 batched-sort probe's smaller-segments-faster
# trend), then refresh run_large40 at the measured winner.
set -u
cd /root/repo
while pgrep -f "r5_chip_phase4.sh" > /dev/null 2>&1; do sleep 30; done
LOG=tools/r5_chip_phase5.log
OUT=tools/r5_buckets_sweep.jsonl
echo "=== phase5 buckets 2048/4096 $(date -u +%H:%M:%S) ===" >&2
for nb in 2048 4096; do
  line=$(env GA_BUCKETED=1 GA_BUCKET_ACCUM=4 GA_BUCKETS=$nb \
    timeout 3600 python tools/measure_count_stage.py 40 25 31 2 2>>$LOG)
  echo "{\"buckets\": $nb, \"r\": ${line:-null}}" >> "$OUT"
done
# pick the winner among 256..4096 from the sweep file and refresh the
# 40 Mb beyond-baseline run with it
best=$(python - <<'PY'
import json
best, bb = None, None
for ln in open("tools/r5_buckets_sweep.jsonl"):
    d = json.loads(ln)
    if d.get("r") and (best is None or d["r"]["best_s"] < best):
        best, bb = d["r"]["best_s"], d["buckets"]
print(bb or 256)
PY
)
echo "=== phase5 run_large40 at GA_BUCKETS=$best $(date -u +%H:%M:%S) ===" >&2
env GA_BUCKETS=$best GA_RL_REPS=3 timeout 5400 \
  python tools/run_large.py 40 25 31 \
  > tools/r5_run_large40_bestnb.json 2>>$LOG
echo "phase5 done $(date -u +%H:%M:%S)" >&2
