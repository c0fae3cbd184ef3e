#!/bin/bash
# Round-4 chip watchdog: the axon tunnel relay died mid-round (RESULTS.md
# platform note); every queued VERDICT-r3 chip measurement is one command
# away but unrunnable until the relay returns. This script polls the relay
# port and, the moment it opens, runs the full measurement sequence
# unattended so a late tunnel revival still yields the data:
#
#   1. count stage at 40 Mb, bucketed OFF vs ON   (VERDICT r3 item 1)
#   2. count stage at 20 Mb, OFF vs ON            (crossover bisection)
#   3. run_large 40 Mb full pipeline              (item 2 + second-process
#      cold walls with the persistent compile cache = item 7)
#   4. CFG-3 acceptance at full scale             (item 2)
#   5. SAMPLE_STRIDE sweep at 40 Mb edge shapes   (item 3, ~84M rows)
#   6. bench.py on the real chip                  (headline for RESULTS)
#
# Results land in /tmp/r4_chip/<step>.json (stderr in <step>.err), with a
# timestamped watchdog.log. Creates /tmp/TUNNEL_BACK as a sentinel so the
# interactive session knows to stop launching CPU-mesh jax processes
# (platform rule: ANY concurrent jax process kills a live chip job).
#
# Usage: bash tools/chip_watchdog_r4.sh [deadline_hours]
set -u
DEADLINE_H=${1:-10}
END=$(( $(date +%s) + DEADLINE_H * 3600 ))
OUT=/tmp/r4_chip
mkdir -p "$OUT"
cd /root/repo

log() { echo "[$(date -u '+%F %T')] $*" >> "$OUT/watchdog.log"; }

probe() { timeout 2 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8082' 2>/dev/null; }

python_busy() {
  # Read-only scan: is any OTHER python process alive? (CPU-forced jax
  # processes kill chip jobs, so wait for CPU-mesh runs/pytest to drain.)
  local d cmd
  for d in /proc/[0-9]*; do
    cmd=$(tr '\0' ' ' < "$d/cmdline" 2>/dev/null) || continue
    case "$cmd" in
      *python*) return 0 ;;
    esac
  done
  return 1
}

log "watchdog started, deadline ${DEADLINE_H}h"
while ! probe; do
  if [ "$(date +%s)" -ge "$END" ]; then
    log "deadline reached; tunnel never returned"
    echo '{"tunnel_returned": false}' > "$OUT/summary.json"
    exit 1
  fi
  sleep 60
done
log "tunnel port 8082 OPEN"
touch /tmp/TUNNEL_BACK

# Let in-flight CPU-mesh work drain before touching the chip.
DRAIN_END=$(( $(date +%s) + 7200 ))
while python_busy; do
  if [ "$(date +%s)" -ge "$DRAIN_END" ]; then
    log "python jobs still busy after 2h drain window; proceeding anyway"
    break
  fi
  sleep 30
done
log "python drained; smoke-checking chip init"

if ! env GA_PLATFORM=tpu timeout 900 python -c \
  "from genome_assembler_tpu.utils import jaxenv; jaxenv.setup(); import jax; print(jax.devices())" \
  >> "$OUT/watchdog.log" 2>&1; then
  log "chip init smoke check FAILED (port open but backend dead)"
  echo '{"tunnel_returned": true, "chip_init_ok": false}' > "$OUT/summary.json"
  exit 2
fi
log "chip init OK; starting measurement sequence"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  log "START $name: $*"
  timeout "$tmo" env GA_PLATFORM=tpu "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"
  log "END $name rc=$?"
}

run count40_flat     5400 env GA_BUCKETED=0 python tools/measure_count_stage.py 40 25 31 2
run count40_bucketed 5400 env GA_BUCKETED=1 python tools/measure_count_stage.py 40 25 31 2
run count20_flat     3600 env GA_BUCKETED=0 python tools/measure_count_stage.py 20 25 31 2
run count20_bucketed 3600 env GA_BUCKETED=1 python tools/measure_count_stage.py 20 25 31 2
run run_large40      7200 python tools/run_large.py 40 25 31
run cfg3_full        10800 python -m genome_assembler_tpu.cli accept 3
run stride84         7200 env GA_MSS_GENOME=40000000 GA_MSS_SKIP_PLAIN=1 \
    python tools/measure_sample_stride.py 8 16 32 64
run bench            5400 python bench.py
run count30_flat     3600 env GA_BUCKETED=0 python tools/measure_count_stage.py 30 25 31 2
run count30_bucketed 3600 env GA_BUCKETED=1 python tools/measure_count_stage.py 30 25 31 2

echo '{"tunnel_returned": true, "chip_init_ok": true, "sequence_done": true}' \
  > "$OUT/summary.json"
log "sequence complete"
exit 0
