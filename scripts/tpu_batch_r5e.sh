#!/bin/bash
# Round-5 batch E: extend the supervision-sparsity ablation seed counts.
# Stage 1 (box): seeds 3-7 x fractions 4/16, 2/16, 1/16 -> n=8 per
# fraction when merged with batch C's seeds 0-2.
# Stage 2 (realistic): seeds 3-5 x the same fractions -> n=6 per
# fraction when merged with batch D's seeds 0-2.
# Usage: bash scripts/tpu_batch_r5e.sh [logfile]
set -u
LOG="${1:-/tmp/tpu_batch_r5e.log}"
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

echo "=== tpu_batch_r5e start $(date)" | tee -a "$LOG"
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

run sparsity-box-ext 8000 python -u scripts/repro_synthetic_consistency.py \
  3 4 5 6 7 --frames 16 --fraction 0.25 0.125 0.0625

run sparsity-real-ext 16000 python -u scripts/repro_synthetic_consistency.py \
  3 4 5 --obj_faces 1280 --frames 16 --fraction 0.25 0.125 0.0625
echo "=== tpu_batch_r5e done $(date)" | tee -a "$LOG"
