"""Segment-level bench for the adapt+infer pipeline (round-2 perf work).

Times the adaptation scan and the sliding-window inference separately at
the headline bench shapes, under switchable kernel/remat options, so
optimizations can be attributed. One TPU process at a time!

    python tools/adapt_bench.py [--groups 8] [--steps 5] [--windows 16]
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="edvr", choices=["edvr", "tof", "duf"],
                    help="backbone (tof/duf complete the backbone x "
                         "workload serving matrix; bn_mode=auto => "
                         "reference train()-mode BN during adaptation)")
    ap.add_argument("--groups", type=int, default=8)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--windows", type=int, default=16)
    ap.add_argument("--adapt-windows", type=int, default=8)
    ap.add_argument("--infer-chunk", type=int, default=None,
                    help="inference chunking (default: 4 for TOF — 16 "
                         "pre-upscaled 576x704 windows spill one chip — "
                         "0 otherwise)")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--duf-s2d", action="store_true",
                    help="DUF only: packed trunk instead of the deployed "
                         "plain default (a measured negative: loses the "
                         "per-call serving regime 0.83-0.90x and its "
                         "backward is ~2.4x slower — networks.serving_clone)")
    ap.add_argument("--chunk-budget", type=int, default=0,
                    help="ops.dcn_fused frame-chunk budget in bytes")
    ap.add_argument("--dcn-impl", default=None,
                    choices=["ref", "fused", "pipelined"],
                    help="global DCN impl override")
    ap.add_argument("--skip", default="", help="comma list: infer,adapt,full")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dynavsr_tpu.adapt.adaptation import (
        AdaptConfig,
        chunked_apply,
        make_adapt_and_infer,
    )
    from dynavsr_tpu.models.edvr import EDVR
    from dynavsr_tpu.ops.dcn_fused import set_frame_chunk_budget
    from dynavsr_tpu.utils.util import enable_compilation_cache

    enable_compilation_cache()
    if args.chunk_budget:
        set_frame_chunk_budget(args.chunk_budget)
    if args.dcn_impl:
        from dynavsr_tpu.ops.dcn import set_dcn_impl

        set_dcn_impl(args.dcn_impl)
    skip = set(filter(None, args.skip.split(",")))

    h, w, scale = 144, 176, 4
    if args.arch == "tof":
        from dynavsr_tpu.models.tof import TOFlow

        model, which, nframes = TOFlow(dtype=jnp.bfloat16, pre_upscale=True,
                                       scale=4), "TOF", 5
        chunk = 4 if args.infer_chunk is None else args.infer_chunk
    elif args.arch == "duf":
        from dynavsr_tpu.models.duf import DUF

        # Plain trunk = the deployed adapt+infer default (the packed
        # backward loses the product: 38.5 vs 68.3 fps —
        # results_r04/duf_packed_adapt_bench.log); --duf-s2d A/Bs packed.
        model, which, nframes = DUF(scale=4, dense1_layers=3,
                                    dtype=jnp.bfloat16,
                                    s2d=args.duf_s2d), "DUF_16L", 7
        chunk = 0 if args.infer_chunk is None else args.infer_chunk
    else:
        model = EDVR(nf=64, nframes=5, groups=args.groups, front_RBs=5,
                     back_RBs=10, dtype=jnp.bfloat16)
        which, nframes = "EDVR", 5
        chunk = 0 if args.infer_chunk is None else args.infer_chunk
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    lw = jax.random.uniform(ks[0], (args.windows, nframes, h, w, 3), jnp.float32)
    slr = jax.random.uniform(
        ks[1], (args.adapt_windows, nframes, h // scale, w // scale, 3))
    lrc = jax.random.uniform(ks[2], (args.adapt_windows, h, w, 3))
    params = jax.jit(model.init)(ks[3], lw[:1])
    from dynavsr_tpu.models.padding import (
        make_model_apply,
        make_mutable_model_apply,
    )

    padded_apply = make_model_apply(model, which, scale)
    mutable_apply = (make_mutable_model_apply(model, which, scale)
                     if args.arch in ("tof", "duf") else None)

    def fetch(tree):
        for leaf in jax.tree_util.tree_leaves(tree):
            np.asarray(jnp.ravel(leaf)[:8])

    def timeit(fn, inputs, label):
        # inputs[0] is a DEDICATED warmup input, never re-timed: the tunnel
        # memoizes identical (executable, inputs) calls (CLAUDE.md gotcha),
        # so re-timing the warmup pair would report a cache replay.
        out = fn(*inputs[0])
        fetch(out)
        times = []
        for inp in inputs[1 : 1 + args.repeats]:
            t0 = time.perf_counter()
            out = fn(*inp)
            fetch(out)
            times.append(time.perf_counter() - t0)
        print(f"{label:32s} best {min(times):.3f}s  times "
              f"{[round(t, 3) for t in times]}", flush=True)
        return min(times)

    # ---- inference only — same chunking as the full pipeline, so the
    # segment decomposition measures the memory regime actually deployed
    # (an unchunked 16-window TOF batch would spill one 16 GB chip).
    t_inf = t_adapt = t_full = float("nan")
    fwd = jax.jit(lambda p, x: chunked_apply(padded_apply, p, x, chunk))
    infer_inputs = [
        (params, jax.random.uniform(jax.random.PRNGKey(100 + i), lw.shape))
        for i in range(args.repeats + 1)
    ]
    if "infer" not in skip:
        t_inf = timeit(fwd, infer_inputs, f"infer {args.windows} windows")

    # ---- adaptation only (scan of fwd+bwd+adam, no inference windows)
    run1 = make_adapt_and_infer(
        model, AdaptConfig(n_steps=args.steps, lr=1e-6, infer_chunk=chunk),
        apply_fn=padded_apply, mutable_apply_fn=mutable_apply)
    one_w = lw[:1]
    adapt_inputs = [
        (params,
         jax.random.uniform(jax.random.PRNGKey(200 + i), slr.shape),
         lrc, one_w)
        for i in range(args.repeats + 1)
    ]
    if "adapt" not in skip:
        t_adapt = timeit(run1, adapt_inputs, f"adapt {args.steps} steps (+1 win)")

    # ---- full pipeline (the bench configuration; same program as run1,
    # jit retraces per input shape)
    run = run1
    full_inputs = [
        (params, slr, lrc,
         jax.random.uniform(jax.random.PRNGKey(300 + i), lw.shape))
        for i in range(args.repeats + 1)
    ]
    if "full" not in skip:
        t_full = timeit(run, full_inputs, "full adapt+infer")

    per_win = t_inf / args.windows
    print(f"\nsegments: infer={t_inf:.3f}s ({per_win*1e3:.1f} ms/window), "
          f"adapt~={t_adapt - per_win:.3f}s, full={t_full:.3f}s "
          f"-> {args.windows / t_full:.2f} fps", flush=True)


if __name__ == "__main__":
    main()
