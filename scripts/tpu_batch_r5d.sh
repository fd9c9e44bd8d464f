#!/bin/bash
# Round-5 batch D: supervision-sparsity ablation at the REALISTIC object
# face count (--obj_faces 1280, ~2.85k faces total) — the same sweep as
# batch C but on the workload the repo headlines. 16-frame videos;
# fractions 4/16, 2/16, 1/16 x seeds 0-2, all in ONE process (shared jit
# cache; per-seed render disk-cached across fractions).
# Usage: bash scripts/tpu_batch_r5d.sh [logfile]
set -u
LOG="${1:-/tmp/tpu_batch_r5d.log}"
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

echo "=== tpu_batch_r5d start $(date)" | tee -a "$LOG"
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

run sparsity-real 13000 python -u scripts/repro_synthetic_consistency.py \
  0 1 2 --obj_faces 1280 --frames 16 --fraction 0.25 0.125 0.0625
echo "=== tpu_batch_r5d done $(date)" | tee -a "$LOG"
