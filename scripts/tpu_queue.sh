#!/bin/bash
# Serialized TPU work queue for when the tunnel re-admits clients.
# ONE axon client at a time (a second silently queues; a killed one can
# wedge the pool claim for hours) — run steps sequentially, let each exit
# cleanly, log everything. Usage: bash scripts/tpu_queue.sh [logdir]
set -u
LOG=${1:-/tmp/tpu_queue}
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

# 0. health probe — abort the queue if the tunnel is still wedged
step probe timeout 300 python -c "import jax; print(jax.devices())" || exit 1

# 1. hardware validation incl. the new int4-KV decode attention check
step validate python scripts/validate_tpu.py --json VALIDATE_r03b.json

# 2. int4 KV cache measurement (kernel-level + end-to-end 8B)
step int4kv python scripts/exp_int4kv.py

# 3. stage-(c/d) A/B: round-1 worktree vs HEAD, identical two-point timing
# (worktree created on demand and removed after — a resident copy of the
# round-1 tree would pollute LoC/copy scans of the repo)
git worktree add /root/repo/.wt_r1 2732ea1 2>/dev/null || true
step ab_head python scripts/ab_stage_cd.py --path /root/repo
step ab_r1   python scripts/ab_stage_cd.py --path /root/repo/.wt_r1
git worktree remove --force /root/repo/.wt_r1 2>/dev/null || true

# 4. full bench capture
step bench python bench.py

echo "queue done $(date -u)" | tee -a "$LOG/queue.log"
