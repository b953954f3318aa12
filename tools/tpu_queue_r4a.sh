#!/bin/bash
# Round-4 TPU queue A: streaming adapt + multi-stream measurements.
# ONE process on the tunnel at a time; rc echoed per leg (ADVICE r3).
set -o pipefail
log=results_r04/stream_adapt_multi.log
step() {
  echo "=== $1 — $(date +%T) ===" >> "$log"
  shift
  timeout "$1" "${@:2}" >> "$log" 2>&1
  echo "[queue] rc=$?" >> "$log"
}
: > "$log"
step "stream gd2 adapt run1 (compiles)" 4500 python tools/stream_bench.py --groups 2 --adapt
step "stream gd2 adapt run2 (cached)"   1800 python tools/stream_bench.py --groups 2 --adapt
step "stream gd2 x4streams run1 (compiles)" 4500 python tools/stream_bench.py --groups 2 --streams 4
step "stream gd2 x4streams run2 (cached)"   1800 python tools/stream_bench.py --groups 2 --streams 4
step "stream gd2 x4streams adapt run1 (compiles)" 4500 python tools/stream_bench.py --groups 2 --streams 4 --adapt
step "stream gd2 x4streams adapt run2 (cached)"   1800 python tools/stream_bench.py --groups 2 --streams 4 --adapt
echo "=== queue done — $(date +%T) ===" >> "$log"
