#!/bin/bash
# Round-5 batch A: /verify drive of the working-tree changes (bench.py
# default flip + AOT phase logging, test fix, fastmath revert) + the
# VERDICT r4 #3 TPU compile apportionment.
#   1. probe gate (trivial matmul = RTT; conv jit = compile service)
#   2. trainwarp CLI drive (the /verify step)
#   3. bench default (now realistic) + bench --toy
#   4. diag_compile_tpu (per-kernel compile-time apportionment)
# Usage: bash scripts/tpu_batch_r5a.sh [logfile]
set -u
LOG="${1:-/tmp/tpu_batch_r5a.log}"
cd "$(dirname "$0")/.."
# Absolute LOG: the trainwarp stage runs in a cd'd subshell, where a
# relative tee target silently writes into the drive dir (lost the r5a
# trainwarp console output).
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

echo "=== tpu_batch_r5a start $(date)" | tee -a "$LOG"
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
run bench-default-real 2700 python bench.py
run bench-toy          2700 python bench.py --toy
run diag-compile       2700 python scripts/diag_compile_tpu.py
echo "=== tpu_batch_r5a done $(date)" | tee -a "$LOG"
