#!/bin/bash
# Round-5 batch K: temporal pair-spacing ablation at the headline row
# (fraction 2/16, 16-frame videos, lambda=2.0): spacing 1 and 6 vs the
# measured default 3, both workloads, one process per workload.
# Usage: bash scripts/tpu_batch_r5k.sh [logfile]
set -u
LOG="${1:-/tmp/tpu_batch_r5k.log}"
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

echo "=== tpu_batch_r5k start $(date)" | tee -a "$LOG"
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

run spc-real 20000 python -u scripts/repro_synthetic_consistency.py \
  0 1 2 3 4 5 --obj_faces 1280 --frames 16 --fraction 0.125 --spacing 1 6
run spc-box 16000 python -u scripts/repro_synthetic_consistency.py \
  0 1 2 3 4 5 6 7 --frames 16 --fraction 0.125 --spacing 1 6
echo "=== tpu_batch_r5k done $(date)" | tee -a "$LOG"
