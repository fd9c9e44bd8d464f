#!/bin/bash
# Standing queue of pending TPU measurements (CLAUDE.md: the axon tunnel
# dies for hours at a time, so TPU work is queued here behind a health
# gate and fired in one go when the tunnel is back — use
# scripts/tpu_wait_and_batch.sh to poll-and-fire automatically).
#
# Current queue (round 4e — segmented-K sampler + fixed-m raster fwd;
# the r4d numbers are VOID: two concurrent batches + /root/repo import
# leak, see CLAUDE.md):
#   1. probe gate (trivial matmul = RTT; conv jit = compile service)
#   2. trainwarp CLI drive (the /verify step for the kernel changes)
#   3. bench toy + realistic (clean prior: 507.6 / 394.8 pairs/s)
#   4. profile toy + realistic — bilinear line reports BOTH
#      uniform-random coords (worst case) and real warp coords (the
#      segmented path's target pattern)
# Usage: bash scripts/tpu_batch.sh [logfile]
set -u
LOG="${1:-/tmp/tpu_batch.log}"
cd "$(dirname "$0")/.."
# Absolute LOG: the trainwarp stage runs in a cd'd subshell, where a
# relative tee target silently writes into the drive dir.
LOG="$(cd "$(dirname "$LOG")" && pwd)/$(basename "$LOG")"
# Pin imports to THIS tree: when the batch runs from a snapshot worktree,
# scripts/* entrypoints put scripts/ (not the root) at sys.path[0], and
# the editable install then resolves `hocon` from /root/repo — measuring
# whatever is half-edited there instead of the snapshot (burned r4d).
# ... but KEEP the axon site dir: dropping it unregisters the axon PJRT
# plugin entirely ("Backend 'axon' is not in the list of known backends",
# burned r4e).
export PYTHONPATH="$(pwd):${PYTHONPATH:-}"

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

DRIVE_DIR=$(mktemp -d)
(cd "$DRIVE_DIR" && run trainwarp-drive 1500 python -u -m hocon.cli.trainwarp \
  --dataset synthetic --image_size 128 --batch_size 8 --epochs 1 \
  --exp_id e2ewarp --synth_videos 2 --synth_frames 8 --fraction 0.25 \
  --lr 1e-4)
run bench-toy      2700 python bench.py
run bench-real     2700 python bench.py --obj_faces 1280
run profile        2700 python scripts/profile_step.py
run profile-real   2700 python scripts/profile_step.py --obj_faces 1280
echo "=== tpu_batch done $(date)" | tee -a "$LOG"
