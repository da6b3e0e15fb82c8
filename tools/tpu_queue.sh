#!/bin/bash
# Serial TPU job queue (consolidates the r4 tpu_queue_r4{a..j}.sh scripts:
# one parameterized runner, queue entries are DATA — VERDICT r4 next #10).
#
# Usage:  tools/tpu_queue.sh [JOBSFILE]          (default tools/tpu_queue_r5.txt)
#
# JOBSFILE lines:   name|timeout_seconds|command...
#   - '#'-prefixed / blank lines are skipped
#   - a literal 'END' line terminates the queue
#   - the file is re-read each iteration, so new jobs may be APPENDED
#     while the runner is live; progress persists in JOBSFILE.done so a
#     restarted runner does not repeat finished jobs
#   - each job logs to /tmp/tpu_r5_<name>.log and is retried once on a
#     non-zero exit (checkpoint caches make retries cheap)
#   - touch /tmp/tpu_hold to pause the queue between jobs (cooperative
#     lock for interactive chip use); remove it to resume.
set -u
cd "$(dirname "$0")/.."
JOBS=${1:-tools/tpu_queue_r5.txt}
STATE="${JOBS}.done"

wait_chip() {
  while [ -e /tmp/tpu_hold ]; do sleep 20; done
  until timeout 120 python tools/tpu_watchdog_probe.py 2>/dev/null \
      | grep -q "probe ok"; do
    sleep 120
    while [ -e /tmp/tpu_hold ]; do sleep 20; done
  done
}

run_job() {
  local log=$1 tmo=$2 cmd=$3
  for attempt in 1 2; do
    wait_chip
    echo "=== attempt $attempt $(date) === $cmd" >> "$log"
    if timeout "$tmo" bash -c "$cmd" >> "$log" 2>&1; then return 0; fi
    echo "=== attempt $attempt FAILED rc=$? $(date) ===" >> "$log"
  done
  return 1
}

n=0
[ -f "$STATE" ] && n=$(cat "$STATE")
while true; do
  total=$(wc -l < "$JOBS")
  if [ "$n" -ge "$total" ]; then sleep 30; continue; fi
  line=$(sed -n "$((n + 1))p" "$JOBS")
  n=$((n + 1)); echo "$n" > "$STATE"
  case "$line" in ''|'#'*) continue ;; END) break ;; esac
  name=${line%%|*}; rest=${line#*|}
  tmo=${rest%%|*};  cmd=${rest#*|}
  echo "[queue] job $n: $name (timeout ${tmo}s)"
  run_job "/tmp/tpu_r5_${name}.log" "$tmo" "$cmd" \
    && echo "[queue] $name OK" || echo "[queue] $name FAILED"
done
echo DONE > /tmp/tpu_r5_done
echo "[queue] finished"
