#!/bin/bash
# Round-4 follow-on TPU batch (fire after tpu_batch_r4.sh completes):
#   1. trivial-matmul health gate
#   2. banded-culling sweeps at realistic face count (re-run after the
#      r4 batch's sweep crashed on a mid-edit module import)
#   3. full-step A/B of the auto-selected banded schedule
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

# Banded-culling sweep at realistic face count (re-run: the r4 batch's
# sweep crashed on a mid-edit module import). Original 4 configs plus
# occupancy-model-guided extras (scripts/analyze_occupancy.py predicts
# LB=128 + banding wins ~20% at 2852 faces; FC16 close second):
run sweep-banded  5400 python scripts/sweep_raster.py --obj_faces 1280 --cull \
    --configs 32,8,256,0 32,8,256,2 32,8,256,4 32,8,128,4
run sweep-extra   5400 python scripts/sweep_raster.py --obj_faces 1280 --cull \
    --configs 32,8,128,0 32,8,128,2 16,8,128,4 16,8,128,2
# A/B the auto-selected banded schedule inside the full train step:
run bench-real-auto 2700 python bench.py --obj_faces 1280
echo "=== tpu_batch_r4b done $(date)" | tee -a "$LOG"
