#!/bin/bash
# Tunnel-revival watcher: probe the TPU tunnel every PROBE_EVERY seconds
# (bounded probes, one process at a time per CLAUDE.md); when a probe
# succeeds, run the serial measurement queue (tools/tpu_queue.sh) once and
# exit. Safe to leave running in the background for a whole session.
#
# Graceful stop: `touch /tmp/tpu_stop` — the watcher exits before its next
# probe, and the queue checks the same sentinel between steps. Use this
# before any other process (e.g. the driver's round-end bench.py) needs
# the tunnel: two processes on the tunnel hang BOTH.
set -u
cd "$(dirname "$0")/.."
PROBE_EVERY=${PROBE_EVERY:-600}
PROBE_TIMEOUT=${PROBE_TIMEOUT:-300}
STOP=/tmp/tpu_stop
LOG=results_r03/tpu_watch.log
mkdir -p results_r03

echo "[watch] start $(date +%H:%M:%S) probe_every=${PROBE_EVERY}s" | tee -a "$LOG"
while true; do
  if [ -e "$STOP" ]; then
    echo "[watch] stop sentinel $STOP — exiting $(date +%H:%M:%S)" | tee -a "$LOG"
    exit 0
  fi
  timeout "$PROBE_TIMEOUT" python - <<'EOF' >>"$LOG" 2>&1
import time
import numpy as np
import jax.numpy as jnp
x = np.random.rand(256, 256).astype("float32") * (time.time() % 1 + 0.5)
print("probe ok", np.asarray(jnp.dot(x, x)).shape)
EOF
  if [ $? -eq 0 ]; then
    echo "[watch] tunnel ALIVE at $(date +%H:%M:%S) — running queue" | tee -a "$LOG"
    bash tools/tpu_queue.sh >>"$LOG" 2>&1
    echo "[watch] queue finished at $(date +%H:%M:%S) rc=$?" | tee -a "$LOG"
    exit 0
  fi
  echo "[watch] probe failed $(date +%H:%M:%S); sleeping ${PROBE_EVERY}s" >>"$LOG"
  sleep "$PROBE_EVERY"
done
