#!/bin/bash
# Round-5 phase-1 chip queue: accumulated staged bucketed merge ON vs OFF
# at the 40 Mb count-stage shape (VERDICT r5 item 1). Serialized — the
# chip is a single shared resource. Results append as JSON lines.
set -u
cd /root/repo
OUT=tools/r5_chip_phase1.jsonl
: > "$OUT"
run() {
  local tag=$1; shift
  echo "=== $tag $(date -u +%H:%M:%S) ===" >&2
  local line
  line=$(env "$@" timeout 3600 python tools/measure_count_stage.py 40 25 31 3 2>>tools/r5_chip_phase1.log)
  if [ -n "$line" ]; then
    echo "{\"tag\": \"$tag\", \"r\": $line}" >> "$OUT"
  else
    echo "{\"tag\": \"$tag\", \"r\": null}" >> "$OUT"
  fi
}
run accum4_default GA_BUCKETED=1 GA_BUCKET_ACCUM=4
run accum1_off     GA_BUCKETED=1 GA_BUCKET_ACCUM=1
run accum8         GA_BUCKETED=1 GA_BUCKET_ACCUM=8
echo "phase1 done $(date -u +%H:%M:%S)" >&2
