#!/bin/bash
# Trimmed round-3 TPU measurement batch (fits one short session):
#   1. trivial-matmul health gate
#   2. bench toy + --stem_s2d A/B
#   3. bench realistic (--obj_faces 1280) + --stem_s2d A/B
#   4. banded-culling sweep at realistic face count (3 configs + control)
#   5. profile_step decomposition (only if time allows; run manually)
# Usage: bash scripts/tpu_batch_r3b.sh [logfile]
set -u
LOG="${1:-/tmp/tpu_batch_r3b.log}"
cd "$(dirname "$0")/.."

run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$name] $(date +%H:%M:%S) :: $*" | tee -a "$LOG"
  timeout "$tmo" "$@" 2>&1 | tee -a "$LOG"
  local rc=${PIPESTATUS[0]}
  echo "=== [$name] exit=$rc" | tee -a "$LOG"
  return "$rc"
}

echo "=== tpu_batch_r3b start $(date)" | tee -a "$LOG"
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

run bench-toy       900 python bench.py
run bench-toy-s2d   900 python bench.py --stem_s2d
run bench-real      900 python bench.py --obj_faces 1280
run bench-real-s2d  900 python bench.py --obj_faces 1280 --stem_s2d
run sweep-banded   1800 python scripts/sweep_raster.py --obj_faces 1280 --cull \
    --configs 32,8,256,0 32,8,256,2 32,8,256,4 32,8,128,4
echo "=== tpu_batch_r3b done $(date)" | tee -a "$LOG"
