#!/bin/bash
# Resilient soak driver for this dev box. Two failure modes observed on long
# real-data runs (both infra, not repo code — see CLAUDE.md):
#   1. the axon tunnel client leaks host RSS ~1x the transferred bytes, so the
#      trainer is eventually OOM-killed (~27k full-size steps);
#   2. the tunnel's bulk data plane can wedge (small RPCs fine, big transfers
#      hang forever), stalling the trainer silently.
# train.py is fully resumable (state_log phases + checkpoint restore), so we
# relaunch until it exits 0, with a watchdog that kills silently-stalled
# children (no Terminal_train_log write for STALL_SEC).
# Usage: scripts/run_soak_resilient.sh BASE_DIR [extra train.py args...]
set -u
BASE=${1:?base dir}
shift
STALL_SEC=${STALL_SEC:-900}
cd "$BASE"
for attempt in $(seq 1 60); do
  echo "=== soak attempt $attempt $(date)"
  PYTHONPATH=/root/repo:/root/.axon_site python /root/repo/train.py "$@" &
  child=$!
  while kill -0 "$child" 2>/dev/null; do
    sleep 60
    logfile=$(ls -t "$BASE"/logs-*/Terminal_train_log 2>/dev/null | head -1)
    if [ -n "$logfile" ]; then
      age=$(( $(date +%s) - $(stat -c %Y "$logfile") ))
      if [ "$age" -gt "$STALL_SEC" ]; then
        echo "=== watchdog: no log output for ${age}s; killing pid $child"
        kill "$child" 2>/dev/null
        sleep 10
        kill -9 "$child" 2>/dev/null
      fi
    fi
  done
  wait "$child"
  code=$?
  if [ $code -eq 0 ]; then
    echo "=== soak complete after $attempt attempt(s)"
    exit 0
  fi
  echo "=== train.py exited $code (OOM kill / stall kill / crash); relaunching from checkpoints"
  sleep 30
done
echo "=== giving up after 60 attempts"
exit 1
