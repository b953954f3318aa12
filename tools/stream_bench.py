"""Streaming SR serving latency bench (eval/streaming.StreamingSR).

Measures the online serving scenario the offline benches can't: frames
arrive ONE at a time, each push pays one per-frame pyramid extraction
(B=1) and each emitted SR frame pays one window fuse (PCD+TSA+recon).
This is the per-frame latency floor of the deployed streaming server —
including the real per-call dispatch cost, which is part of the serving
model (you cannot batch frames that haven't arrived).

Reports, for EDVR-M at Vid4-like LR shapes (144x176, x4):
  - steady-state ms/frame (timed clip pass / frames emitted),
  - median per-push latency for pushes that emit a frame (arrival ->
    SR pixel forced on host), i.e. user-visible added latency beyond the
    structural N//2-frame emission lag.

Tunnel hygiene (CLAUDE.md): inputs vary per frame and per pass; each
emitted frame is forced by fetching a single pixel (np.asarray(sr[0, 0])
— executes the graph, transfers 3 floats); first pass compiles, second
pass is authoritative; run twice in fresh processes and trust run 2.

Run: python tools/stream_bench.py [--groups 1] [--frames 24] [--quick]
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", type=int, default=1,
                    help="deformable groups (1 = flagship serving config)")
    ap.add_argument("--frames", type=int, default=24,
                    help="clip length per timed pass")
    ap.add_argument("--passes", type=int, default=3,
                    help="timed passes (best reported; pass 0 compiles)")
    ap.add_argument("--quick", action="store_true",
                    help="tiny config CPU/smoke mode")
    args = ap.parse_args()

    from dynavsr_tpu.eval.streaming import StreamingSR
    from dynavsr_tpu.models.edvr import EDVR
    from dynavsr_tpu.utils.util import enable_compilation_cache

    enable_compilation_cache()

    if args.quick:
        model = EDVR(nf=8, nframes=3, groups=2, front_RBs=1, back_RBs=1,
                     dtype=jnp.bfloat16)
        n_frames, h, w, t = 3, 16, 16, max(6, min(args.frames, 8))
    else:
        model = EDVR(nf=64, nframes=5, groups=args.groups, front_RBs=5,
                     back_RBs=10, dtype=jnp.bfloat16)
        n_frames, h, w, t = 5, 144, 176, args.frames

    key = jax.random.PRNGKey(0)
    params = model.init(
        key, jax.random.uniform(key, (1, n_frames, h, w, 3), jnp.float32))
    stream = StreamingSR(model, params, n_frames=n_frames)

    best_ms_frame = None
    for p in range(args.passes):
        frames = np.asarray(jax.random.uniform(
            jax.random.PRNGKey(1000 + p), (t, h, w, 3), jnp.float32))
        stream.reset()
        push_lat = []
        emitted = 0
        t0 = time.perf_counter()
        for f in frames:
            tp = time.perf_counter()
            out = stream.push(f)
            for _, sr in out:
                np.asarray(sr[0, 0])  # force; 3-float fetch
            if out:
                push_lat.append(time.perf_counter() - tp)
                emitted += len(out)
        for _, sr in stream.flush():
            np.asarray(sr[0, 0])
            emitted += 1
        total = time.perf_counter() - t0
        assert emitted == t, (emitted, t)
        ms_frame = total / emitted * 1e3
        med_push = float(np.median(push_lat)) * 1e3 if push_lat else float("nan")
        tag = "compile" if p == 0 else "timed"
        print(f"# pass {p} ({tag}): {ms_frame:.1f} ms/frame steady-state, "
              f"median emitting-push latency {med_push:.1f} ms "
              f"({emitted} frames, {total:.3f} s)", flush=True)
        if p > 0:
            best_ms_frame = ms_frame if best_ms_frame is None \
                else min(best_ms_frame, ms_frame)

    if best_ms_frame is not None:
        print(f"streaming groups={args.groups} shape=({t},{h},{w},3): "
              f"{best_ms_frame:.1f} ms/frame = {1e3 / best_ms_frame:.2f} fps",
              flush=True)


if __name__ == "__main__":
    main()
