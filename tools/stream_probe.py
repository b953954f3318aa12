"""Decompose the streaming push cost (round-5 fused-step regression probe).

The round-5 single-dispatch redesign (eval/streaming._StreamCore: extract +
ring write + window gather + fuse in ONE jitted, ring-donated call) measured
94.4 ms/frame B=1 steady state vs the round-4 multi-dispatch design's 74.7
(results_r05/stream_b1_r5.log vs results_r03/stream_bench_gd1_run2.log) —
the opposite of the intended dispatch-overhead win. This probe times every
candidate component per-call (distinct session-unique inputs, best-of-reps —
the only regime that reproduces on the tunnel, CLAUDE.md):

  extract      — per-frame pyramid extraction alone (old design dispatch 1)
  stack3       — the three jnp.stack dispatches over N buffered pyramids
                 (old design dispatches 2-4)
  fuse         — fuse_pyramid on pre-stacked windows (old design dispatch 5)
  args_fuse    — fuse taking N separate per-frame pyramids as ARGUMENTS and
                 stacking in-graph (candidate design: no device stacks, no
                 ring state)
  ingest       — fused-core ring write alone (rings donated through)
  emit         — fused-core window gather + fuse alone (rings as input)
  step         — the shipped fused step (ingest+emit, one dispatch)

Interpretation: old steady state ~ extract + stack3 + fuse (+2-5 dispatch
latencies); shipped ~ step; candidate ~ extract + args_fuse. Whichever sum
is smallest wins; if step >> ingest+emit the ring donation/output
marshalling itself is the regression.

RESOLUTION (round 5): the "regression" never existed — 94.4 and 74.7 came
from different sessions, and streaming latency is not cross-session
comparable on this tunnel (CLAUDE.md gotcha). The in-session A/B measured
the fused design at 59.3-63.9 ms/frame vs the multi-dispatch design's
69.5-70.8 — a real 1.13x win — and constant staging as neutral
(results_r05/stream_b1_*, RESULTS.md "Fused streaming push"). This probe
remains useful for per-call component decomposition.

Run: python tools/stream_probe.py [--groups 2] [--reps 6]
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _timed(tag, fn, inputs, force):
    """Per-call best-of-reps over distinct pre-staged inputs."""
    force(fn(*inputs[0]))  # compile + warm (never re-timed)
    times = []
    for args in inputs[1:]:
        t0 = time.perf_counter()
        force(fn(*args))
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"# {tag:10s} {best * 1e3:8.2f} ms/call "
          f"times={[round(t * 1e3, 1) for t in times]}", flush=True)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", type=int, default=2)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke-test without touching "
                         "the single-process TPU tunnel; the JAX_PLATFORMS "
                         "env var alone is overridden by the axon site hook)")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from dynavsr_tpu.eval.streaming import StreamingSR
    from dynavsr_tpu.models.edvr import EDVR
    from dynavsr_tpu.utils.util import enable_compilation_cache

    enable_compilation_cache()
    if args.quick:
        model = EDVR(nf=8, nframes=3, groups=min(args.groups, 2), front_RBs=1,
                     back_RBs=1, dtype=jnp.bfloat16)
        n, h, w = 3, 16, 16
    else:
        model = EDVR(nf=64, nframes=5, groups=args.groups, front_RBs=5,
                     back_RBs=10, dtype=jnp.bfloat16)
        n, h, w = 5, 144, 176
    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(
        key, jax.random.uniform(key, (1, n, h, w, 3), jnp.float32))

    stream = StreamingSR(model, params, n_frames=n)
    base = (os.getpid() * 1000003) ^ (int(time.time()) & 0xFFFFFF)
    reps = args.reps

    def rand_frame(i):
        return jax.random.uniform(jax.random.PRNGKey(base + i),
                                  (1, h, w, 3), jnp.float32)

    def force_tree(tree):
        # Fetch ONE tiny slice: a single device->host fetch forces the whole
        # executable, and fetching every leaf would bias legs whose outputs
        # have more leaves (step returns 4 ring leaves + sr; fuse returns 1)
        # by extra tunnel round-trips.
        leaf = jax.tree_util.tree_leaves(tree)[0]
        np.asarray(jnp.ravel(leaf)[:4])

    # ---- components of the OLD (round-4) multi-dispatch design ----------
    extract = jax.jit(lambda p, f: model.apply(p, f, method="extract_pyramid"))
    pyrs = [extract(params, rand_frame(1000 + j)) for j in range(n + reps)]
    force_tree(pyrs)

    _timed("extract", extract,
           [(params, rand_frame(i)) for i in range(reps + 1)], force_tree)

    stack3 = jax.jit(lambda *ps: tuple(
        jnp.stack([p[lvl] for p in ps], axis=1) for lvl in range(3)))
    _timed("stack3", stack3,
           [tuple(pyrs[i:i + n]) for i in range(reps + 1)], force_tree)

    fuse = jax.jit(lambda p, l1, l2, l3, c: model.apply(
        p, l1, l2, l3, c, method="fuse_pyramid"))
    stacked = [stack3(*pyrs[i:i + n]) for i in range(reps + 1)]
    force_tree(stacked)
    _timed("fuse", fuse,
           [(params,) + stacked[i] + (rand_frame(i),)
            for i in range(reps + 1)], force_tree)

    # ---- candidate: fuse over N per-frame pyramid ARGUMENTS -------------
    def args_fuse_fn(p, c, *ps):
        l1, l2, l3 = (jnp.stack([q[lvl] for q in ps], axis=1)
                      for lvl in range(3))
        return model.apply(p, l1, l2, l3, c, method="fuse_pyramid")

    args_fuse = jax.jit(args_fuse_fn)
    _timed("args_fuse", args_fuse,
           [(params, rand_frame(i)) + tuple(pyrs[i:i + n])
            for i in range(reps + 1)], force_tree)

    # ---- components of the shipped fused-ring design ---------------------
    # Build per-rep ring states (distinct contents defeat tunnel memoization)
    def fresh_rings(i):
        stream.reset()
        stream._ensure_rings(rand_frame(9000 + i))
        rings = stream._rings
        # fill every slot with real data so the gather reads non-zeros
        for s in range(stream._R):
            rings = stream._ingest_j(params, rings, rand_frame(i * 100 + s),
                                     np.int32(s))
        return rings

    idx = stream._ring_idx(2, 1 << 30)
    slot = np.int32(3)

    emit = stream._emit_j
    _timed("emit", emit,
           [(params, fresh_rings(i), idx) for i in range(reps + 1)],
           force_tree)

    ingest = stream._ingest_j  # donates rings — rebuild per call
    _timed("ingest", ingest,
           [(params, fresh_rings(100 + i), rand_frame(i), slot)
            for i in range(reps + 1)], force_tree)

    step = stream._step_j  # donates rings — rebuild per call
    _timed("step", step,
           [(params, fresh_rings(200 + i), rand_frame(i), slot, idx)
            for i in range(reps + 1)], force_tree)

    print("# interpretation: old ~ extract+stack3+fuse (5 dispatches); "
          "shipped ~ step (1); candidate ~ extract+args_fuse (2)",
          flush=True)


if __name__ == "__main__":
    main()
