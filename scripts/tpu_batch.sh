#!/bin/bash
# Standing queue of pending TPU measurements (CLAUDE.md: the axon tunnel
# dies for hours at a time, so TPU work is queued here behind a health
# gate and fired in one go when the tunnel is back — use
# scripts/tpu_wait_and_batch.sh to poll-and-fire automatically).
#
# Current queue (round 4, after tpu_batch_r4 + _r4b ran and the banded
# culling scheme was deleted):
#   1. probe gate (trivial matmul = RTT; conv jit = compile service)
#   2. bench realistic on the simplified (banding-free) kernel — expect
#      ~393.9 pairs/s (same code path as before the deletion)
#   3. FC/RB re-sweep at the realistic face count on the simplified
#      kernel (FC16/64, RB16 were last swept at 1.55k faces in round 2)
#   4. fixed isolated-raster profile (posed MANO mesh; the old random-blob
#      mesh defeated chunk culling and overstated raster ~4x) — toy and
#      realistic face counts
#   5. consistency-gain repro seeds 3-5 (adds power to the 3-seed round-4
#      realistic result: -0.82/+1.07/+0.53 mm)
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
if ! run probe 660 python -c "
import time, jax, jax.numpy as jnp
t0 = time.time(); d = jax.devices(); print('devices', d, '%.1fs' % (time.time() - t0))
t0 = time.time()
x = jnp.ones((512, 512)); (x @ x).block_until_ready()
print('matmul compile+run %.1fs' % (time.time() - t0))
t0 = time.time()
k = jnp.ones((3, 3, 64, 64), jnp.bfloat16)
f = jax.jit(lambda a: jax.lax.conv_general_dilated(
    jax.lax.conv_general_dilated(a, k, (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')),
    k, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC')).sum())
f(jnp.ones((2, 64, 64, 64), jnp.bfloat16)).block_until_ready()
dt = time.time() - t0
print('conv-stack compile+run %.1fs' % dt)
assert dt < 90, 'compile service degraded'
"; then
  echo "=== tunnel DOWN/degraded; aborting batch" | tee -a "$LOG"
  exit 1
fi

run bench-real     2700 python bench.py --obj_faces 1280
run sweep-fc-rb    5400 python scripts/sweep_raster.py --obj_faces 1280 --cull \
    --configs 32,8,256 16,8,256 64,8,256 32,16,256 16,16,256
run profile        2700 python scripts/profile_step.py
run profile-real   2700 python scripts/profile_step.py --obj_faces 1280
run repro-seeds345 5400 python scripts/repro_synthetic_consistency.py 3 4 5 --obj_faces 1280
echo "=== tpu_batch done $(date)" | tee -a "$LOG"
