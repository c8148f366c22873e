#!/bin/bash
# Resilient soak driver for this dev box: the axon tunnel client leaks ~1x the
# transferred bytes in host RSS (see CLAUDE.md / dev_leak_probe.py), so very long
# real-data runs are eventually OOM-killed. train.py is fully resumable
# (state_log phases + checkpoint restore), so we just relaunch until it exits 0.
# Usage: scripts/run_soak_resilient.sh BASE_DIR [extra train.py args...]
set -u
BASE=${1:?base dir}
shift
cd "$BASE"
for attempt in $(seq 1 20); do
  echo "=== soak attempt $attempt $(date)"
  PYTHONPATH=/root/repo:/root/.axon_site python /root/repo/train.py "$@"
  code=$?
  if [ $code -eq 0 ]; then
    echo "=== soak complete after $attempt attempt(s)"
    exit 0
  fi
  echo "=== train.py exited $code (likely OOM-killed); relaunching from checkpoints"
  sleep 5
done
echo "=== giving up after 20 attempts"
exit 1
