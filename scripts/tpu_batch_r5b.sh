#!/bin/bash
# Round-5 batch B: extend the consistency-gain evidence to >=10 seeds per
# workload (VERDICT r4 #5). Box workload has seeds 0-2, realistic has
# 0-5 (RESULTS.md tables); this adds box 3..9 and realistic 6..9, each
# set in ONE process so seeds 2..N reuse the first seed's jit cache.
# Usage: bash scripts/tpu_batch_r5b.sh [logfile]
set -u
LOG="${1:-/tmp/tpu_batch_r5b.log}"
cd "$(dirname "$0")/.."
export PYTHONPATH="$(pwd):${PYTHONPATH:-}"

run() {
  local name="$1" tmo="$2"; shift 2
  echo "=== [$name] $(date +%H:%M:%S) :: $*" | tee -a "$LOG"
  timeout "$tmo" "$@" 2>&1 | tee -a "$LOG"
  local rc=${PIPESTATUS[0]}
  echo "=== [$name] exit=$rc $(date +%H:%M:%S)" | tee -a "$LOG"
  return "$rc"
}

echo "=== tpu_batch_r5b start $(date)" | tee -a "$LOG"
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

run consist-box  14000 python -u scripts/repro_synthetic_consistency.py 3 4 5 6 7 8 9
run consist-real 12000 python -u scripts/repro_synthetic_consistency.py --obj_faces 1280 6 7 8 9
echo "=== tpu_batch_r5b done $(date)" | tee -a "$LOG"
