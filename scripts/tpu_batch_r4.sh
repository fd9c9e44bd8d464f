#!/bin/bash
# Round-4 TPU measurement batch, priority-ordered so a degraded tunnel
# still yields the most important numbers first:
#   0. health gate: trivial matmul (RTT) + small-conv jit (compile service)
#   1. bench realistic (--obj_faces 1280)      <- VERDICT r3 #2 headline
#   2. bench toy                               <- cross-round comparability
#   3. bench realistic --stem_s2d              <- VERDICT r3 #1 A/B
#   4. bench toy --stem_s2d
#   5. banded-culling sweep at realistic face count
#   6. profile_step decomposition (trunk MFU)
#   7. realistic consistency-gain repro (3 seeds)
# Timeouts sized for a degraded compile service (observed: warp-step
# compile >880 s while the trivial probe stays ~1.6 s — small ops fast,
# compiles crawling; CLAUDE.md tunnel notes).
# Usage: bash scripts/tpu_batch_r4.sh [logfile]
set -u
LOG="${1:-/tmp/tpu_batch_r4.log}"
cd "$(dirname "$0")/.."

run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$name] $(date +%H:%M:%S) :: $*" | tee -a "$LOG"
  timeout "$tmo" "$@" 2>&1 | tee -a "$LOG"
  local rc=${PIPESTATUS[0]}
  echo "=== [$name] exit=$rc" | tee -a "$LOG"
  return "$rc"
}

echo "=== tpu_batch_r4 start $(date)" | tee -a "$LOG"
if ! run probe 300 python -c "
import time, jax, jax.numpy as jnp
t0 = time.time(); d = jax.devices(); print('devices', d, '%.1fs' % (time.time() - t0))
t0 = time.time()
x = jnp.ones((512, 512)); (x @ x).block_until_ready()
print('matmul compile+run %.1fs' % (time.time() - t0))
# Compile-service probe: a conv stack is ~10-20 s healthy; degraded 60 s+.
t0 = time.time()
k = jnp.ones((3, 3, 64, 64), jnp.bfloat16)
f = jax.jit(lambda a: jax.lax.conv_general_dilated(
    jax.lax.conv_general_dilated(a, k, (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')),
    k, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC')).sum())
f(jnp.ones((2, 64, 64, 64), jnp.bfloat16)).block_until_ready()
print('conv-stack compile+run %.1fs' % (time.time() - t0))
"; then
  echo "=== tunnel DOWN; aborting batch" | tee -a "$LOG"
  exit 1
fi

run bench-real      2700 python bench.py --obj_faces 1280
run bench-toy       2700 python bench.py
run bench-real-s2d  2700 python bench.py --obj_faces 1280 --stem_s2d
run bench-toy-s2d   2700 python bench.py --stem_s2d
run sweep-banded    5400 python scripts/sweep_raster.py --obj_faces 1280 --cull \
    --configs 32,8,256,0 32,8,256,2 32,8,256,4 32,8,128,4
run profile         2700 python scripts/profile_step.py
run profile-s2d     2700 python scripts/profile_step.py --stem_s2d
run repro-real      5400 python scripts/repro_synthetic_consistency.py 0 1 2 --obj_faces 1280
echo "=== tpu_batch_r4 done $(date)" | tee -a "$LOG"
