#!/bin/bash
# Serial TPU measurement queue — the round-3 pending measurements that were
# blocked by the wedged tunnel (NOTES_ROUND4.md items 10/11 + the DUF
# packed-trunk serve A/B + the seq-mode serving A/B + a fresh default
# bench).
#
# Invariants (CLAUDE.md gotchas): ONE process on the tunnel at a time —
# this script runs everything serially; each serve bench runs TWICE in
# fresh processes because the first timed call in the process that just
# compiled can read ~10x inflated (run 2, on the cached executable, is
# authoritative); every step is timeout-bounded so a re-wedge can't hang
# the queue forever. Logs land in results_r03/.
#
# ORDER matters: the quick serving measurements run FIRST so a
# late-reviving tunnel still yields them; the ~6 h noise-training leg runs
# LAST (kill via /tmp/tpu_queue.pid if the driver's round-end bench is
# near — two processes on the tunnel hang both).
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/tpu_queue.pid
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

step "seq-mode serving A/B (EDVR.forward_seq; run 1 compiles, run 2 authoritative)"
for i in 1 2; do
  timeout 2400 python bench.py --flagship --seq 2>&1 | tee "$R/bench_flagship_seq_run$i.log"
  timeout 2400 python bench.py --flagship       2>&1 | tee "$R/bench_flagship_run$i.log"
  timeout 2400 python bench.py --parity-only --seq 2>&1 | tee "$R/bench_parity_seq_run$i.log"
done

step "DUF packed-trunk serve A/B — run 1 (compiles)"
timeout 2400 python tools/duf_serve_bench.py --mode both 2>&1 | tee "$R/duf_serve_ab_run1.log"
step "DUF packed-trunk serve A/B — run 2 (cached; authoritative)"
timeout 1200 python tools/duf_serve_bench.py --mode both 2>&1 | tee "$R/duf_serve_ab_run2.log"

step "streaming serving latency (StreamingSR; pass 0 compiles in-process)"
for i in 1 2; do
  timeout 2400 python tools/stream_bench.py --groups 1 2>&1 | tee "$R/stream_bench_gd1_run$i.log"
done
timeout 2400 python tools/stream_bench.py --groups 2 2>&1 | tee "$R/stream_bench_gd2.log"

step "DUF adapt+infer segment bench — run 1 (compiles)"
timeout 3000 python tools/adapt_bench.py --arch duf 2>&1 | tee "$R/duf_adapt_bench_run1.log"
step "DUF adapt+infer segment bench — run 2 (cached; authoritative)"
timeout 1500 python tools/adapt_bench.py --arch duf 2>&1 | tee "$R/duf_adapt_bench_run2.log"

step "default bench sanity (fresh process on cached executables)"
timeout 3300 python bench.py 2>&1 | tee "$R/bench_default_post.log"

step "noise-aware degradation-training A/B (NOTES_ROUND4 item 10; ~6 h — LAST)"
timeout 21600 python tools/blind_adaptation_check.py \
    --kernels iso:1.8:n0.01 iso:1.8:n0.03 iso:3.5 aniso:3.2:0.8:0.3 \
    --seed 0 --meta-iters 150 --adapt-lrs 1e-6 1e-5 \
    --train-noise 0.05 --root /tmp/blind_noise_s0 2>&1 \
    | tee "$R/blind_noise_train005_s0.log"

step "queue done"
