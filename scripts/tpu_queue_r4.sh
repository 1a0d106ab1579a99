#!/bin/bash
# Round-4 TPU catch-up queue (run by tpu_watch.sh when the pool re-admits).
# ONE axon client at a time; each step exits cleanly before the next.
set -u
LOG=${1:-/tmp/r4tpu}
mkdir -p "$LOG"
cd /root/repo

step() {
  name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a "$LOG/queue.log"
  "$@" > "$LOG/$name.log" 2>&1
  rc=$?
  echo "=== $name exit $rc $(date -u +%H:%M:%S) ===" | tee -a "$LOG/queue.log"
  return $rc
}

step probe timeout 300 python -c "import jax; print(jax.devices())" || exit 1
step serve_profile timeout 1500 python scripts/exp_serve_profile.py
echo "queue done $(date -u)" | tee -a "$LOG/queue.log"
