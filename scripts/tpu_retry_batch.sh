#!/bin/bash
# Retry wrapper around tpu_wait_and_batch's pattern: the tunnel's compile
# service oscillates around the health threshold, so a single
# probe-then-fire can launch into a window that degrades seconds later
# (burned batch r5a: poller probe 83.4s -> batch's own probe timed out).
# This loops the WHOLE cycle until the batch exits 0, and requires TWO
# consecutive healthy probes (60s apart) before each launch attempt.
# Usage: bash scripts/tpu_retry_batch.sh <batch_script> <poll_log> <batch_log>
set -u
BATCH="${1:?batch script}"
POLL_LOG="${2:-/tmp/tpu_poll.log}"
BATCH_LOG="${3:-/tmp/tpu_batch.log}"
cd "$(dirname "$0")/.."

probe_once() {
  local N=$((512 + $(date +%s) % 97))
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
sys.exit(0 if dt < 75 else 3)
EOF
}

attempt=0
while true; do
  attempt=$((attempt + 1))
  echo "=== attempt $attempt probe1 $(date +%H:%M:%S)" >> "$POLL_LOG"
  if ! probe_once; then
    echo "probe1 unhealthy; sleeping 600" >> "$POLL_LOG"
    sleep 600
    continue
  fi
  sleep 60
  echo "=== attempt $attempt probe2 $(date +%H:%M:%S)" >> "$POLL_LOG"
  if ! probe_once; then
    echo "probe2 unhealthy; sleeping 600" >> "$POLL_LOG"
    sleep 600
    continue
  fi
  echo "=== two healthy probes; launching $BATCH $(date)" >> "$POLL_LOG"
  bash "$BATCH" "$BATCH_LOG"
  rc=$?
  echo "=== batch rc=$rc $(date)" >> "$POLL_LOG"
  [ "$rc" -eq 0 ] && exit 0
  echo "=== batch failed; re-polling in 600s" >> "$POLL_LOG"
  sleep 600
done
