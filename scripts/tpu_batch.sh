#!/bin/bash
# One-shot TPU measurement batch for the round-3 open items. The axon
# tunnel dies for hours at a time (CLAUDE.md), so every pending TPU
# measurement is queued here behind a health gate and run sequentially
# in one go the moment the tunnel is back:
#   1. trivial-matmul probe (gate: tunnel alive and compiles not degraded)
#   2. bench.py toy + --stem_s2d A/B
#   3. bench.py --obj_faces 1280 (realistic) + --stem_s2d A/B
#   4. profile_step decomposition (default and --stem_s2d) incl. trunk MFU
#   5. banded-culling sweep at realistic face count
# Usage: bash scripts/tpu_batch.sh [logfile]
set -u
LOG="${1:-/tmp/tpu_batch.log}"
cd "$(dirname "$0")/.."

run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$name] $(date +%H:%M:%S) :: $*" | tee -a "$LOG"
  timeout "$tmo" "$@" 2>&1 | tee -a "$LOG"
  local rc=${PIPESTATUS[0]}
  echo "=== [$name] exit=$rc" | tee -a "$LOG"
  return "$rc"
}

echo "=== tpu_batch start $(date)" | tee -a "$LOG"
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

run bench-toy       1200 python bench.py
run bench-toy-s2d   1200 python bench.py --stem_s2d
run bench-real      1200 python bench.py --obj_faces 1280
run bench-real-s2d  1200 python bench.py --obj_faces 1280 --stem_s2d
run profile         1800 python scripts/profile_step.py
run profile-s2d     1800 python scripts/profile_step.py --stem_s2d
run sweep-banded    2400 python scripts/sweep_raster.py --obj_faces 1280 --cull \
    --configs 32,8,256,0 32,8,256,2 32,8,256,4 32,8,128,4 16,8,256,4 64,8,256,2
run consist-real    5400 python scripts/repro_synthetic_consistency.py 0 1 2 --obj_faces 1280
echo "=== tpu_batch done $(date)" | tee -a "$LOG"
