#!/bin/bash
# Round-5 batch I: lambda=4.0 point for the 3-point lambda curve at 2/16
# Usage: bash scripts/tpu_batch_r5i.sh [logfile]
set -u
LOG="${1:-/tmp/tpu_batch_r5i.log}"
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

echo "=== tpu_batch_r5i start $(date)" | tee -a "$LOG"
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

run lam4-real-0125 16000 python -u scripts/repro_synthetic_consistency.py \
  0 1 2 3 4 5 --obj_faces 1280 --frames 16 --fraction 0.125 --lambda_consist 4.0
run lam4-box-0125 10000 python -u scripts/repro_synthetic_consistency.py \
  0 1 2 3 4 5 6 7 --frames 16 --fraction 0.125 --lambda_consist 4.0
echo "=== tpu_batch_r5i done $(date)" | tee -a "$LOG"
