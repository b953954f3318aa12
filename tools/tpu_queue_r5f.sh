#!/bin/bash
# Round-5 TPU queue F (LAST, after all product-code changes are frozen):
# re-warm the wiped compile cache with the default bench so the driver's
# end-of-round bench.py lands on cached executables (NOTES_ROUND5 item 11
# — the round-4->5 container restart wiped ~/.cache/dynavsr_jax again),
# then capture the authoritative cached run for RESULTS.md.
set -u -o pipefail
cd "$(dirname "$0")/.."
echo $$ > /tmp/tpu_queue_r5f.pid
trap 'rm -f /tmp/tpu_queue_r5f.pid' EXIT
R=results_r05
mkdir -p "$R"
step() {
  if [ -e /tmp/tpu_stop ]; then
    echo "[queue] stop sentinel /tmp/tpu_stop — exiting before: $1"; exit 0
  fi
  echo; echo "=== $1 — $(date +%H:%M:%S) ==="
  shift
  timeout "$1" "${@:2}" 2>&1 | tee "$R/$LOG"
  echo "[queue] rc=$?"
}
LOG=bench_default_r5f_run1.log step "default bench run 1 (cold compiles; NOT authoritative)" 7200 python bench.py
LOG=bench_default_r5f_run2.log step "default bench run 2 (cached; authoritative)" 3600 python bench.py
echo; echo "=== queue F done — $(date +%H:%M:%S) ==="
