#!/bin/bash
# Patient TPU pool watcher: probe until the tunnel re-admits clients, then
# run the serialized catch-up queue (scripts/tpu_queue.sh). Designed to be
# launched detached (setsid nohup) so no tool/driver timeout kills a client
# mid-claim — a killed claim-holder wedges the pool for hours.
# Status file: $LOG/watch.status  (PROBING n | QUEUE_RUNNING | DONE | GAVE_UP)
set -u
LOG=${1:-/tmp/tpu_queue}
mkdir -p "$LOG"
cd /root/repo

n=0
max=200   # ~200 * (240s probe + 120s sleep) = worst case ~20h; driver ends us first
while true; do
  n=$((n+1))
  echo "PROBING $n $(date -u +%H:%M:%S)" > "$LOG/watch.status"
  # the probe itself is an axon client; 240s leash per memory protocol.
  # A probe that never obtains the claim is safe to kill (observed repeatedly).
  if timeout 240 python -c "import jax; print(jax.devices())" >> "$LOG/probe.log" 2>&1; then
    echo "QUEUE_RUNNING $(date -u +%H:%M:%S)" > "$LOG/watch.status"
    bash scripts/tpu_queue.sh "$LOG"
    echo "DONE $(date -u +%H:%M:%S)" > "$LOG/watch.status"
    exit 0
  fi
  if [ "$n" -ge "$max" ]; then
    echo "GAVE_UP $(date -u +%H:%M:%S)" > "$LOG/watch.status"
    exit 1
  fi
  sleep 120
done
