#!/bin/bash
# Device-recovery watcher.  The axon exec path can die while jax.devices()
# still answers (observed round 5: every client's FIRST executed op hangs in
# futex_do_wait; round 3 saw an 8+ h outage of the same tunnel).  Probe with a
# real executed matmul under a hard timeout; when it completes, hand off to
# the given queue script.  Each probe is its own short-lived process, so a
# hung probe is reaped by `timeout` and holds no client state.
set -u
cd "$(dirname "$0")/.."
QUEUE="${1:-scripts/run_round5_queue_f.sh}"
echo "=== device watcher start $(date -u +%FT%TZ) (queue: $QUEUE)"
n=0
while true; do
  n=$((n + 1))
  if timeout 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
print(float(jax.device_get((x @ x)[0, 0])))" >/dev/null 2>&1; then
    echo "=== device exec RECOVERED after $n probes $(date -u +%FT%TZ)"
    break
  fi
  echo "=== probe $n: exec path still dead $(date -u +%FT%TZ)"
  sleep 120
done
exec bash "$QUEUE"
