#!/bin/bash
# Round-4 follow-on TPU batch (fire after tpu_batch_r3b.sh completes):
#   1. trivial-matmul health gate
#   2. profile_step decomposition (trunk MFU) — default + --stem_s2d
#   3. realistic-object consistency-gain experiment (3 seeds, VERDICT r3 #3)
# Usage: bash scripts/tpu_batch_r4b.sh [logfile]
set -u
LOG="${1:-/tmp/tpu_batch_r4b.log}"
cd "$(dirname "$0")/.."

run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$name] $(date +%H:%M:%S) :: $*" | tee -a "$LOG"
  timeout "$tmo" "$@" 2>&1 | tee -a "$LOG"
  local rc=${PIPESTATUS[0]}
  echo "=== [$name] exit=$rc" | tee -a "$LOG"
  return "$rc"
}

echo "=== tpu_batch_r4b start $(date)" | tee -a "$LOG"
if ! run probe 150 python -c "
import time, jax, jax.numpy as jnp
t0 = time.time(); d = jax.devices(); print('devices', d, '%.1fs' % (time.time() - t0))
t0 = time.time()
x = jnp.ones((512, 512)); (x @ x).block_until_ready()
dt = time.time() - t0
print('matmul compile+run %.1fs' % dt)
assert dt < 60, 'tunnel degraded'
"; then
  echo "=== tunnel DOWN/degraded; aborting batch" | tee -a "$LOG"
  exit 1
fi

run profile       1200 python scripts/profile_step.py
run profile-s2d   1200 python scripts/profile_step.py --stem_s2d
run repro-real    3600 python scripts/repro_synthetic_consistency.py 0 1 2 --obj_faces 1280
echo "=== tpu_batch_r4b done $(date)" | tee -a "$LOG"
