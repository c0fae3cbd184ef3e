#!/bin/bash
# Round-5 master queue v2: everything after the full-scale CFG-4 run
# releases the host. Chip timings first (quiet host), CPU-heavy
# provenance last.
set -u
cd /root/repo
while pgrep -f "ga-tpu accept 4" > /dev/null 2>&1; do sleep 30; done
sleep 10
LOG=tools/r5_phase6.log
OUT=tools/r5_nb_headtohead.jsonl
: > "$OUT"
echo "=== phase6a nb 1024 vs 2048 clean $(date -u +%H:%M:%S) ===" >&2
for nb in 1024 2048; do
  line=$(env GA_BUCKETED=1 GA_BUCKETS=$nb \
    timeout 3600 python tools/measure_count_stage.py 40 25 31 3 2>>$LOG)
  echo "{\"buckets\": $nb, \"r\": ${line:-null}}" >> "$OUT"
done
echo "=== phase6b cfg3 warm retime $(date -u +%H:%M:%S) ===" >&2
GA_ACCEPT_WARM=1 timeout 10800 python -m genome_assembler_tpu.cli accept 3 \
  > tools/r5_cfg3_full_warm_clean.json 2>>$LOG
echo "=== phase6c cfg5 retime $(date -u +%H:%M:%S) ===" >&2
GA_ACCEPT_WARM=1 timeout 7200 python -m genome_assembler_tpu.cli accept 5 \
  > tools/r5_cfg5_full_clean.json 2>>$LOG
echo "=== cfg6 full scale $(date -u +%H:%M:%S) ===" >&2
env GA_PLATFORM=cpu JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 GA_ACCEPT_SCALE=1.0 \
  timeout 21600 python -m genome_assembler_tpu.cli accept 6 \
  > tools/r5_cfg6_full.json 2>tools/r5_cfg6_full.log
echo "master queue done $(date -u +%H:%M:%S)" >&2
