#!/bin/bash
# Round-5 batch F: lambda_consist diagnostic for the realistic-object
# fraction-0.25 warp divergences (batch D/E: seeds 1 and 4 diverge at
# the default lambda_consist=2.0, gains -9.15 / -7.0 mm). Rerun the two
# diverging seeds plus two healthy controls (0, 2) at lambda_consist=1.0
# to test whether the divergence is a loss-balance issue.
# Usage: bash scripts/tpu_batch_r5f.sh [logfile]
set -u
LOG="${1:-/tmp/tpu_batch_r5f.log}"
cd "$(dirname "$0")/.."
LOG="$(cd "$(dirname "$LOG")" && pwd)/$(basename "$LOG")"
export PYTHONPATH="$(pwd):${PYTHONPATH:-}"

run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$name] $(date +%H:%M:%S) :: $*" | tee -a "$LOG"
  timeout "$tmo" "$@" 2>&1 | tee -a "$LOG"
  local rc=${PIPESTATUS[0]}
  echo "=== [$name] exit=$rc $(date +%H:%M:%S)" | tee -a "$LOG"
  return "$rc"
}

echo "=== tpu_batch_r5f start $(date)" | tee -a "$LOG"
if ! run probe 660 python -c "
import time, jax, jax.numpy as jnp
t0 = time.time(); d = jax.devices(); print('devices', d, '%.1fs' % (time.time() - t0))
t0 = time.time()
x = jnp.ones((512, 512)); (x @ x).block_until_ready()
print('matmul compile+run %.1fs' % (time.time() - t0))
"; then
  echo "=== tunnel DOWN/degraded; aborting batch" | tee -a "$LOG"
  exit 1
fi

run lam-diag 8000 python -u scripts/repro_synthetic_consistency.py \
  0 1 2 4 --obj_faces 1280 --frames 16 --fraction 0.25 --lambda_consist 1.0
echo "=== tpu_batch_r5f done $(date)" | tee -a "$LOG"
