#!/bin/bash
# Session-6 TPU queue — tunnel revived but the compile cache was wiped by
# a container restart, and only ~1 h of wall clock remains. Priorities:
#   1. Warm + capture the DEFAULT bench line (exactly what the driver
#      records as BENCH_r03) — run 1 compiles, run 2 authoritative.
#   2. DUF packed-trunk serve A/B (flip the default if it wins).
#   3. DUF adapt+infer segment bench (NOTES_ROUND4 item 11).
#   4. Streaming serving latency.
# The ~6 h noise-training leg (item 10) is intentionally OMITTED: it
# cannot finish this session and a leg still running at driver time would
# wedge the round-end bench (two processes on the tunnel hang both).
#
# Invariants (CLAUDE.md): ONE process on the tunnel — strictly serial;
# every step timeout-bounded; /tmp/tpu_stop sentinel checked between
# steps for graceful handoff before the driver's bench.
set -u -o pipefail
cd "$(dirname "$0")/.."
echo $$ > /tmp/tpu_queue_s6.pid
trap 'rm -f /tmp/tpu_queue_s6.pid' EXIT
R=results_r03
mkdir -p "$R"

step() {
  if [ -e /tmp/tpu_stop ]; then
    echo "[queue] stop sentinel /tmp/tpu_stop — exiting before: $*"
    exit 0
  fi
  echo; echo "=== $* — $(date +%H:%M:%S) ==="
}

step "probe (tiny matmul, varied input)"
timeout 300 python - <<'EOF'
import time
import numpy as np
import jax.numpy as jnp
x = np.random.rand(256, 256).astype("float32") * (time.time() % 1 + 0.5)
print("probe ok", np.asarray(jnp.dot(x, x)).shape)
EOF
if [ $? -ne 0 ]; then echo "probe failed — tunnel still wedged"; exit 1; fi

step "default bench — run 1 (cold compiles; number NOT authoritative)"
timeout 5400 python bench.py 2>&1 | tee "$R/bench_default_s6_run1.log"; echo "[queue] rc=$?"

step "default bench — run 2 (fresh process, cached; authoritative)"
timeout 3600 python bench.py 2>&1 | tee "$R/bench_default_s6_run2.log"; echo "[queue] rc=$?"

step "DUF packed-trunk serve A/B — run 1 (compiles)"
timeout 2400 python tools/duf_serve_bench.py --mode both 2>&1 | tee "$R/duf_serve_ab_run1.log"; echo "[queue] rc=$?"
step "DUF packed-trunk serve A/B — run 2 (cached; authoritative)"
timeout 1200 python tools/duf_serve_bench.py --mode both 2>&1 | tee "$R/duf_serve_ab_run2.log"; echo "[queue] rc=$?"

step "DUF adapt+infer segment bench — run 1 (compiles)"
timeout 3000 python tools/adapt_bench.py --arch duf 2>&1 | tee "$R/duf_adapt_bench_run1.log"; echo "[queue] rc=$?"
step "DUF adapt+infer segment bench — run 2 (cached; authoritative)"
timeout 1500 python tools/adapt_bench.py --arch duf 2>&1 | tee "$R/duf_adapt_bench_run2.log"; echo "[queue] rc=$?"

step "streaming serving latency gd1 run 1 (pass 0 compiles in-process)"
timeout 2400 python tools/stream_bench.py --groups 1 2>&1 | tee "$R/stream_bench_gd1_run1.log"; echo "[queue] rc=$?"
step "streaming serving latency gd1 run 2"
timeout 1200 python tools/stream_bench.py --groups 1 2>&1 | tee "$R/stream_bench_gd1_run2.log"; echo "[queue] rc=$?"
step "streaming serving latency gd2"
timeout 2400 python tools/stream_bench.py --groups 2 2>&1 | tee "$R/stream_bench_gd2.log"; echo "[queue] rc=$?"

step "queue done"
