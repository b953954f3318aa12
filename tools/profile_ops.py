"""Op-level TPU profiler: trace a workload and print top ops by time.

    python tools/profile_ops.py [--workload edvr_fwd|dcn|adapt] [--top 15]

Uses jax.profiler + ProfileData (xplane) — the op table the reference
never had (SURVEY.md §5 tracing row).
"""

from __future__ import annotations

import argparse
import collections
import glob
import os.path as osp
import re
import sys
import tempfile

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def top_ops(trace_dir: str, top: int = 15, dump: int = 0):
    from jax.profiler import ProfileData

    path = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))[-1]
    pd = ProfileData.from_file(path)
    totals = collections.Counter()
    raw = collections.Counter()  # full op name -> ns (for --dump)
    for plane in pd.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                m = re.match(r"%([\w.\-]+) = \S+ (\w[\w\-]*)\(", ev.name)
                label = m.group(2) if m else ev.name[:40]
                if m and m.group(2) == "fusion":
                    km = re.search(r"kind=k(\w+)", ev.name)
                    label = f"fusion:{km.group(1) if km else '?'}"
                    if "gather" in ev.name:
                        label += "(gather)"
                    elif "scatter" in ev.name:
                        label += "(scatter)"
                totals[label] += ev.duration_ns
                if dump:
                    raw[ev.name[:240]] += ev.duration_ns
    if dump:
        print(f"--- top {dump} raw op names ---")
        for name, ns in raw.most_common(dump):
            print(f"  {ns / 1e6:9.2f} ms  {name}")
    return totals.most_common(top)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", default="edvr_fwd",
                    choices=["edvr_fwd", "dcn", "adapt", "adapt_only", "tof",
                             "duf", "stream_step"])
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--groups", type=int, default=8)
    ap.add_argument("--dump", type=int, default=0,
                    help="also print the N highest-duration RAW op names "
                         "(identifies anonymous fusion:Custom entries)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    trace_dir = tempfile.mkdtemp(prefix="jaxprof_")
    ks = jax.random.split(jax.random.PRNGKey(0), 6)

    if args.workload == "edvr_fwd":
        from dynavsr_tpu.models.edvr import EDVR

        model = EDVR(nf=64, nframes=5, groups=args.groups, front_RBs=5,
                     back_RBs=10, dtype=jnp.bfloat16)
        x = jax.random.uniform(ks[0], (4, 5, 144, 176, 3))
        params = jax.jit(model.init)(ks[1], x[:1])
        f = jax.jit(model.apply)
        _ = np.asarray(f(params, x)[0, 0, :4, 0])
        with jax.profiler.trace(trace_dir):
            o = f(params, x + 1e-3)
            _ = np.asarray(o[0, 0, :4, 0])
    elif args.workload == "dcn":
        from dynavsr_tpu.ops.dcn_fused import deform_conv2d_fused

        gd = args.groups
        x = jax.random.uniform(ks[0], (20, 144, 176, 64), jnp.bfloat16)
        off = (jax.random.uniform(ks[1], (20, 144, 176, 2 * gd * 9), jnp.bfloat16) - 0.5) * 4
        m = jax.random.uniform(ks[2], (20, 144, 176, gd * 9), jnp.bfloat16)
        w = jax.random.uniform(ks[3], (3, 3, 64, 64), jnp.bfloat16) * 0.1
        f = jax.jit(lambda *a: deform_conv2d_fused(*a, deformable_groups=gd))
        _ = np.asarray(f(x, off, m, w)[0, 0, :4, 0])
        with jax.profiler.trace(trace_dir):
            o = f(x + 1e-3, off, m, w)
            _ = np.asarray(o[0, 0, :4, 0])
    elif args.workload == "tof":
        from dynavsr_tpu.models.tof import TOFlow

        model = TOFlow(dtype=jnp.bfloat16)
        x = jax.random.uniform(ks[0], (4, 7, 576, 704, 3))  # x4 Vid4 scale
        params = jax.jit(model.init)(ks[1], x[:1])
        f = jax.jit(model.apply)
        _ = np.asarray(f(params, x)[0, :4, 0])
        with jax.profiler.trace(trace_dir):
            o = f(params, x + 1e-3)
            _ = np.asarray(o[0, :4, 0])
    elif args.workload == "duf":
        from dynavsr_tpu.models.duf import DUF

        model = DUF(scale=4, dense1_layers=3, dtype=jnp.bfloat16)
        x = jax.random.uniform(ks[0], (4, 7, 144, 176, 3))
        params = jax.jit(model.init)(ks[1], x[:1])
        f = jax.jit(model.apply)
        _ = np.asarray(f(params, x)[0, :4, 0])
        with jax.profiler.trace(trace_dir):
            o = f(params, x + 1e-3)
            _ = np.asarray(o[0, :4, 0])
    elif args.workload == "adapt_only":
        # The k-step adaptation scan ALONE (no inference): the segment
        # measured Gd-INDEPENDENT at ~0.275 s = 40% of the Gd=2 clip
        # (results_r05/adapt_split_g{1,2}.log) — profile where those
        # 55 ms/step go at SLR scale.
        from dynavsr_tpu.adapt.adaptation import AdaptConfig, make_adapt_fn
        from dynavsr_tpu.models.edvr import EDVR

        model = EDVR(nf=64, nframes=5, groups=args.groups, front_RBs=5,
                     back_RBs=10, dtype=jnp.bfloat16)
        slr = jax.random.uniform(ks[1], (8, 5, 36, 44, 3))
        lrc = jax.random.uniform(ks[2], (8, 144, 176, 3))
        params = jax.jit(model.init)(ks[3], slr[:1])
        adapt = make_adapt_fn(model, AdaptConfig(n_steps=5))
        p2, losses = adapt(params, slr, lrc)
        _ = np.asarray(losses)
        with jax.profiler.trace(trace_dir):
            p2, losses = adapt(params, slr + 1e-3, lrc)
            _ = np.asarray(losses)
    elif args.workload == "stream_step":
        # The round-5 fused streaming push (eval/streaming._StreamCore.step:
        # extract + ring write + window gather + fuse, ring donated) — the
        # executable behind the 94.4 ms/frame B=1 regression
        # (results_r05/stream_b1_r5.log vs round-3's 74.7 multi-dispatch).
        from dynavsr_tpu.eval.streaming import StreamingSR
        from dynavsr_tpu.models.edvr import EDVR

        model = EDVR(nf=64, nframes=5, groups=args.groups, front_RBs=5,
                     back_RBs=10, dtype=jnp.bfloat16)
        n, h, w = 5, 144, 176
        params = jax.jit(model.init)(
            ks[1], jax.random.uniform(ks[0], (1, n, h, w, 3), jnp.float32))
        stream = StreamingSR(model, params, n_frames=n)
        frame = jax.random.uniform(ks[2], (1, h, w, 3), jnp.float32)
        stream._ensure_rings(frame)
        rings = stream._rings
        for s in range(stream._R):  # fill the ring with real data
            rings = stream._ingest_j(params, rings, frame + s * 1e-3,
                                     np.int32(s))
        idx = stream._ring_idx(2, 1 << 30)
        rings, sr = stream._step_j(params, rings, frame, np.int32(3), idx)
        _ = np.asarray(sr[0, 0, :4, 0])
        with jax.profiler.trace(trace_dir):
            rings, sr = stream._step_j(params, rings, frame + 1e-3,
                                       np.int32(4), idx)
            _ = np.asarray(sr[0, 0, :4, 0])
    else:  # adapt
        from dynavsr_tpu.adapt.adaptation import AdaptConfig, make_adapt_and_infer
        from dynavsr_tpu.models.edvr import EDVR

        model = EDVR(nf=64, nframes=5, groups=args.groups, front_RBs=5,
                     back_RBs=10, dtype=jnp.bfloat16)
        lw = jax.random.uniform(ks[0], (16, 5, 144, 176, 3))
        slr = jax.random.uniform(ks[1], (8, 5, 36, 44, 3))
        lrc = jax.random.uniform(ks[2], (8, 144, 176, 3))
        params = jax.jit(model.init)(ks[3], lw[:1])
        # infer_chunk=0 matches bench.py's measured configuration
        run = make_adapt_and_infer(model, AdaptConfig(n_steps=5, infer_chunk=0))
        sr, _l = run(params, slr, lrc, lw)
        _ = np.asarray(sr[0, 0, :4, 0])
        with jax.profiler.trace(trace_dir):
            sr, _l = run(params, slr, lrc, lw + 1e-3)
            _ = np.asarray(sr[0, 0, :4, 0])

    total = 0
    rows = top_ops(trace_dir, args.top, dump=args.dump)
    all_ns = sum(ns for _, ns in rows)
    print(f"top {args.top} XLA ops ({args.workload}, groups={args.groups}):")
    for label, ns in rows:
        print(f"  {ns/1e6:9.2f} ms  {label}")
    print(f"  (top-{args.top} sum: {all_ns/1e6:.1f} ms)")


if __name__ == "__main__":
    main()
