"""Streaming SR serving latency bench (eval/streaming.StreamingSR).

Measures the online serving scenario the offline benches can't: frames
arrive ONE at a time, each push pays one per-frame pyramid extraction
(B=1) and each emitted SR frame pays one window fuse (PCD+TSA+recon).
This is the per-frame latency floor of the deployed streaming server —
including the real per-call dispatch cost, which is part of the serving
model (you cannot batch frames that haven't arrived).

Modes beyond the plain single stream:
  --adapt       adapt-then-serve (the DynaVSR product, online): an MFDN
                pseudo-task + k-step adaptation runs once the first
                adapt-windows are complete (StreamingSR adapter warm-up);
                reports the warm-up push latency separately from the
                steady-state serving rate.
  --streams B   B lockstep streams (MultiStreamSR): one batched extract
                per arrival step, one batched fuse per emission — the
                multi-stream throughput mode; reports ms/frame/stream.
                Composes with --adapt (per-stream batched adaptation).
  --param-groups G
                with --streams B --adapt: adapt/serve G param GROUPS of
                B/G streams each (streams in a group share one adapted
                param set — the per-camera deployment mode). Default:
                one group per stream (the fully per-stream mode).
                Grouped serving runs one lax.map dispatch per step
                (dense convs per group — eval/streaming.py design note).

Reports, for EDVR-M at Vid4-like LR shapes (144x176, x4):
  - steady-state ms/frame (timed clip pass / frames emitted; per stream
    when --streams > 1),
  - median per-push latency for pushes that emit a frame (arrival ->
    SR pixel forced on host), i.e. user-visible added latency beyond the
    structural N//2-frame emission lag,
  - with --adapt: the warm-up push latency (adaptation + first burst).

Tunnel hygiene (CLAUDE.md): inputs vary per frame and per pass; each
emitted frame is forced by fetching a single pixel (np.asarray(sr[0, 0])
— executes the graph, transfers 3 floats); first pass compiles, second
pass is authoritative; run twice in fresh processes and trust run 2.

Run: python tools/stream_bench.py [--groups 1] [--frames 24] [--quick]
     [--adapt] [--streams B]
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
    ap.add_argument("--adapt", action="store_true",
                    help="adapt-then-serve: MFDN pseudo-task + k-step "
                         "adaptation on the first --adapt-windows windows")
    ap.add_argument("--adapt-windows", type=int, default=8)
    ap.add_argument("--adapt-steps", type=int, default=5)
    ap.add_argument("--streams", type=int, default=1,
                    help="lockstep streams (MultiStreamSR batching)")
    ap.add_argument("--param-groups", type=int, default=0,
                    help="adapted param groups (0 = one per stream); "
                         "streams split into --streams/G blocks sharing "
                         "one adapted param set each")
    ap.add_argument("--quick", action="store_true",
                    help="tiny config CPU/smoke mode")
    ap.add_argument("--arch", default="edvr", choices=["edvr", "tof", "duf"],
                    help="edvr = StreamingSR (pyramid split); tof/duf = "
                         "WindowStreamSR (generic window-buffer streamer — "
                         "round-4 verdict item 5). tof/duf are "
                         "single-stream only (--streams must be 1)")
    args = ap.parse_args()

    from dynavsr_tpu.eval.streaming import (
        MultiStreamSR,
        StreamingSR,
        WindowStreamSR,
        make_streaming_adapter,
    )
    from dynavsr_tpu.models.edvr import EDVR
    from dynavsr_tpu.models.networks import define_G
    from dynavsr_tpu.utils.util import enable_compilation_cache

    enable_compilation_cache()

    window_apply = None
    if args.arch != "edvr" and args.streams > 1:
        raise SystemExit("--arch tof/duf streams via WindowStreamSR (B=1)")
    if args.arch == "tof":
        # Raw-LR contract via the module-internal bicubic front-end (same
        # build as bench.py's tof adapt+infer leg); 7-frame window is the
        # reference TOF eval protocol.
        from dynavsr_tpu.models.padding import make_model_apply
        from dynavsr_tpu.models.tof import TOFlow

        model = TOFlow(dtype=jnp.bfloat16, pre_upscale=True, scale=4)
        window_apply = make_model_apply(model, "TOF", 4)
        n_frames, h, w, t = 7, 144, 176, args.frames
        if args.quick:
            n_frames, h, w, t = 3, 16, 16, max(6, min(args.frames, 8))
            args.adapt_windows = min(args.adapt_windows, 2)
    elif args.arch == "duf":
        from dynavsr_tpu.models.duf import DUF

        model = DUF(scale=4, dense1_layers=3, dtype=jnp.bfloat16)
        n_frames, h, w, t = 7, 144, 176, args.frames
        if args.quick:
            h, w, t = 16, 16, max(8, min(args.frames, 10))
            args.adapt_windows = min(args.adapt_windows, 2)
    elif args.quick:
        model = EDVR(nf=8, nframes=3, groups=2, front_RBs=1, back_RBs=1,
                     dtype=jnp.bfloat16)
        n_frames, h, w, t = 3, 16, 16, max(6, min(args.frames, 8))
        args.adapt_windows = min(args.adapt_windows, 2)
    else:
        model = EDVR(nf=64, nframes=5, groups=args.groups, front_RBs=5,
                     back_RBs=10, dtype=jnp.bfloat16)
        n_frames, h, w, t = 5, 144, 176, args.frames

    b = args.streams
    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(
        key, jax.random.uniform(key, (1, n_frames, h, w, 3), jnp.float32))

    adapter = None
    if args.adapt:
        from dynavsr_tpu.adapt.adaptation import AdaptConfig

        est = define_G({"scale": 4, "network_G": {
            "which_model_G": "MFDN", "nf": 8 if args.quick else 64,
            "dtype": "bfloat16"}})
        ep = jax.jit(est.init)(jax.random.PRNGKey(1),
                               jnp.zeros((1, n_frames, h, w, 3)))
        mutable_fn = None
        if args.arch != "edvr":  # BN nets adapt in train_ema mode
            from dynavsr_tpu.models.padding import make_mutable_model_apply

            which = "TOF" if args.arch == "tof" else "DUF_16L"
            mutable_fn = make_mutable_model_apply(model, which, 4)
        adapter = make_streaming_adapter(
            model, AdaptConfig(n_steps=args.adapt_steps, lr=1e-6),
            est.apply, ep, apply_fn=window_apply,
            mutable_apply_fn=mutable_fn, batched=b > 1)
    k_adapt = args.adapt_windows if args.adapt else 0

    if args.arch != "edvr":
        stream = WindowStreamSR(model, params, n_frames=n_frames,
                                apply_fn=window_apply, adapter=adapter,
                                adapt_windows=k_adapt)
    elif b > 1:
        stream = MultiStreamSR(model, params, n_streams=b,
                               n_frames=n_frames, adapter=adapter,
                               adapt_windows=k_adapt,
                               n_groups=args.param_groups or None)
    else:
        stream = StreamingSR(model, params, n_frames=n_frames,
                             adapter=adapter, adapt_windows=k_adapt)
    warm_at = k_adapt + n_frames // 2 - 1 if args.adapt else -1

    best_ms_frame = None
    for p in range(args.passes):
        shape = (t, b, h, w, 3) if b > 1 else (t, h, w, 3)
        frames = np.asarray(jax.random.uniform(
            jax.random.PRNGKey(1000 + p), shape, jnp.float32))
        stream.reset()
        push_lat = []
        warm_lat = float("nan")
        emitted = 0
        t0 = time.perf_counter()
        for j, f in enumerate(frames):
            tp = time.perf_counter()
            out = stream.push(f)
            for _, sr in out:
                np.asarray(sr[..., 0, 0, :][..., 0])  # force; tiny fetch
            if j == warm_at:
                warm_lat = time.perf_counter() - tp
            elif out:
                push_lat.append(time.perf_counter() - tp)
            emitted += len(out)
        for _, sr in stream.flush():
            np.asarray(sr[..., 0, 0, :][..., 0])
            emitted += 1
        total = time.perf_counter() - t0
        assert emitted == t, (emitted, t)
        ms_frame = total / (emitted * b) * 1e3
        med_push = float(np.median(push_lat)) * 1e3 if push_lat else float("nan")
        tag = "compile" if p == 0 else "timed"
        # With --adapt the per-frame figure AMORTIZES the one-time warm-up
        # adaptation over this t-frame clip (it shrinks as clips lengthen);
        # true steady-state is the median emitting-push latency, which
        # measured IDENTICAL adapt vs no-adapt (~200 ms at B=4 — same
        # serving executables: results_r04/stream_groups_g1_squeezed.log
        # vs stream_shared_noadapt_rerun.log).
        kind = "clip-amortized" if args.adapt else "steady-state"
        warm_txt = f", warm-up push {warm_lat*1e3:.1f} ms" if args.adapt else ""
        print(f"# pass {p} ({tag}): {ms_frame:.1f} ms/frame/stream "
              f"{kind}, median emitting-push latency {med_push:.1f} ms"
              f"{warm_txt} ({emitted} frames x {b} streams, {total:.3f} s)",
              flush=True)
        if p > 0:
            best_ms_frame = ms_frame if best_ms_frame is None \
                else min(best_ms_frame, ms_frame)

    if best_ms_frame is not None:
        pg = f" param_groups={args.param_groups}" if args.param_groups else ""
        print(f"streaming groups={args.groups} streams={b}{pg} "
              f"adapt={args.adapt} shape=({t},{h},{w},3): "
              f"{best_ms_frame:.1f} ms/frame/stream = "
              f"{1e3 / best_ms_frame:.2f} fps/stream", flush=True)


if __name__ == "__main__":
    main()
