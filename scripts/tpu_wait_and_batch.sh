#!/bin/bash
# Poll the tunnel's COMPILE service (a fresh conv jit — the trivial matmul
# is server-cached and stays fast even when compiles crawl); when healthy,
# fire the given batch script. Usage:
#   setsid nohup bash scripts/tpu_wait_and_batch.sh [batch_script] [poll_log] [batch_log] &
set -u
BATCH="${1:-scripts/tpu_batch_r4.sh}"
POLL_LOG="${2:-/tmp/tpu_poll.log}"
BATCH_LOG="${3:-/tmp/tpu_batch.log}"
cd "$(dirname "$0")/.."

while true; do
  echo "=== probe $(date +%H:%M:%S)" >> "$POLL_LOG"
  # Fresh shapes each attempt (size nudged by minute) so neither the local
  # nor any server-side compile cache can fake a healthy result.
  N=$((512 + $(date +%s) % 97))
  timeout 600 python - "$N" >> "$POLL_LOG" 2>&1 <<'EOF'
import sys, time, jax, jax.numpy as jnp
n = int(sys.argv[1])
t0 = time.time()
k = jnp.ones((3, 3, 64, 64), jnp.bfloat16)
f = jax.jit(lambda a: jax.lax.conv_general_dilated(
    jax.lax.conv_general_dilated(a, k, (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC')),
    k, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC')).sum())
f(jnp.ones((2, n, 64, 64), jnp.bfloat16)).block_until_ready()
dt = time.time() - t0
print('conv-stack compile+run %.1fs (n=%d)' % (dt, n))
sys.exit(0 if dt < 90 else 3)
EOF
  rc=$?
  echo "probe rc=$rc" >> "$POLL_LOG"
  if [ "$rc" -eq 0 ]; then
    echo "=== compile service healthy; launching batch $(date)" >> "$POLL_LOG"
    bash "$BATCH" "$BATCH_LOG"
    echo "=== batch finished rc=$? $(date)" >> "$POLL_LOG"
    exit 0
  fi
  sleep 600
done
