"""Headline benchmark: EDVR-M x4 frames/sec/chip WITH test-time adaptation.

This is BASELINE.json's north-star metric: per clip, run k on-device
adaptation steps (the DynaVSR product loop, SURVEY.md §3.4) then
sliding-window inference, and report SR frames per second per chip.

The whole adapt+infer pipeline is ONE jitted function (lax.scan over the
adaptation steps + batched inference), so the measurement includes
everything the reference's per-clip Python loop does.

The default run measures BOTH configurations and prints ONE JSON line:
  value          — the groups=8 reference-parity config (the reference's
                   EDVR ctor uses deformable groups 8, SURVEY.md §2.1 [H])
  flagship_fps   — the TPU-flagship config (deformable_groups=1, otherwise
                   identical EDVR-M; configs/train/train_EDVR_M_TPU.yml).
                   Quality-parity for Gd=1 vs Gd=8 is verified under the
                   blind-adaptation protocol — RESULTS.md round-3 matrix.

vs_baseline: ratio against PYTORCH_GPU_FPS_ESTIMATE. The reference repo
publishes no throughput numbers (SURVEY.md §6 [H]); the denominator is an
estimate DERIVED in BASELINE.md §"GPU-baseline derivation" from (a) the
EDVR-M FLOP count at these exact shapes (XLA cost analysis), (b) published
V100 efficiency on comparable video-restoration workloads, and (c) a
measured torch-CPU anchor of this same pipeline (tools/torch_cpu_anchor.py,
pure-torch replicas from tests/torch_replicas.py). UNVERIFIED on real GPU
hardware (none in this environment) — labeled accordingly.

Usage: python bench.py [--quick|--parity-only|--flagship|--edvr-l|--edvr-l-serve]
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Derivation in BASELINE.md ("GPU-baseline derivation", round 3): FLOP-based
# V100 estimate ~4.6 fps, torch-CPU-anchor extrapolation ~5-6 fps -> 5.0 kept.
PYTORCH_GPU_FPS_ESTIMATE = 5.0


def _arm_tunnel_watchdog():
    """The axon TPU tunnel can WEDGE: every call hangs — even backend init —
    across fresh processes, for hours (CLAUDE.md gotchas). A hung bench.py
    gives the driver nothing; this daemon thread instead emits one honest
    JSON line and exits hard if no result has printed within
    BENCH_WATCHDOG_S (default 3600 s — the default run's seven legs pay
    ~10-15 min of cold remote-AOT compiles on a fresh container plus the
    measurements, so the bound is generous; set 0 to disable)."""
    import os
    import threading

    budget = float(os.environ.get("BENCH_WATCHDOG_S", "3600"))
    if budget <= 0:
        return

    def fire():
        print(json.dumps({
            "metric": "edvr_m_x4_fps_per_chip_with_adaptation",
            "value": None,
            "unit": "frames/sec/chip",
            "vs_baseline": None,
            "error": f"no result within {budget:.0f}s — "
                     "TPU tunnel wedged or compile stalled",
        }), flush=True)
        os._exit(3)

    t = threading.Timer(budget, fire)
    t.daemon = True
    t.start()
    global _watchdog
    _watchdog = t


_watchdog = None


def _force(tree):
    # NB: under the axon TPU tunnel neither jax.block_until_ready nor
    # per-leaf .block_until_ready() reliably blocks; only a device->host
    # fetch forces execution. Fetch a tiny slice of every leaf.
    import jax
    import jax.numpy as jnp
    import numpy as np

    for leaf in jax.tree_util.tree_leaves(tree):
        np.asarray(jnp.ravel(leaf)[:8])


def _effective_groups(args, groups: int) -> int:
    """--quick coerces Gd so the tiny nf=8 model stays divisible; the JSON
    metric label must report the group count actually measured."""
    return min(groups, 2) if args.quick else groups


def _measure_adapt_infer(args, groups: int, nf: int = 64, front: int = 5,
                         back: int = 10, infer_chunk: int = 0,
                         seq: bool = False):
    """Best-of-N adapt+infer time for one EDVR config; returns fps.

    seq=True measures the sequence-mode serving path (EDVR.forward_seq:
    per-frame pyramids extracted once for the clip and shared across
    windows — exact, tests/test_seq_infer.py): the workload is the SAME
    n_windows output frames, but inference consumes the 16-frame clip +
    sliding-window indices instead of 16 pre-materialized windows (which
    is what a real clip looks like — windows share frames)."""
    import jax
    import jax.numpy as jnp

    from dynavsr_tpu.adapt.adaptation import (
        AdaptConfig,
        make_adapt_and_infer,
        make_adapt_and_infer_seq,
    )
    from dynavsr_tpu.data.windows import all_windows
    from dynavsr_tpu.models.edvr import EDVR

    if args.quick:
        nf, nframes, groups, front, back = 8, 3, _effective_groups(args, groups), 1, 1
        h, w, n_windows, n_adapt = 16, 16, 4, 2
    else:
        # EDVR-M on Vid4-like LR frames (calendar: 180x144 at x4).
        nframes = 5
        h, w, n_windows, n_adapt = 144, 176, 16, 8

    model = EDVR(
        nf=nf, nframes=nframes, groups=groups, front_RBs=front, back_RBs=back,
        dtype=jnp.bfloat16,
    )
    scale = 4
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    lr_windows = jax.random.uniform(k1, (n_windows, nframes, h, w, 3), jnp.float32)
    slr_windows = jax.random.uniform(
        k2, (n_adapt, nframes, h // scale, w // scale, 3), jnp.float32)
    lr_centers = jax.random.uniform(k3, (n_adapt, h, w, 3), jnp.float32)

    params = model.init(k4, lr_windows[:1])
    cfg = AdaptConfig(n_steps=args.adapt_steps, lr=1e-6, optimizer="adam",
                      infer_chunk=infer_chunk)  # 0 = single-batch (fastest)

    # Pre-generate distinct inputs: the tunnel memoizes identical
    # (executable, inputs) calls, which would fake a ~0s run.
    if seq:
        win_idx = jnp.asarray(all_windows(n_windows, nframes, "reflection"))
        run_seq = make_adapt_and_infer_seq(model, cfg)
        run = lambda p, s, c, frames: run_seq(p, s, c, frames, win_idx)  # noqa: E731
        in_shape = (n_windows, h, w, 3)
    else:
        run = make_adapt_and_infer(model, cfg)
        in_shape = (n_windows, nframes, h, w, 3)
    # inputs[0] is a DEDICATED warmup input, never re-timed: the tunnel
    # memoizes identical (executable, inputs) calls (CLAUDE.md gotcha), so
    # re-timing the warmup pair could report a cache replay.
    inputs = [
        jax.random.uniform(jax.random.PRNGKey(100 + i), in_shape, jnp.float32)
        for i in range(args.repeats + 1)
    ]

    # Warmup / compile.
    sr, losses = run(params, slr_windows, lr_centers, inputs[0])
    _force((sr, losses))

    times = []
    for lw in inputs[1:]:
        t0 = time.perf_counter()
        sr, losses = run(params, slr_windows, lr_centers, lw)
        _force((sr, losses))
        times.append(time.perf_counter() - t0)

    best = min(times)
    fps = n_windows / best
    print(
        f"# groups={groups} nf={nf} back_RBs={back} seq={seq} "
        f"shape=({n_windows},{nframes},{h},{w},3) adapt_steps={args.adapt_steps} "
        f"best={best:.3f}s times={[round(t, 3) for t in times]}",
        file=sys.stderr,
    )
    return fps


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="tiny shapes (CPU smoke test)")
    ap.add_argument("--parity-only", action="store_true",
                    help="measure only the groups=8 reference-parity config")
    ap.add_argument("--flagship", action="store_true",
                    help="measure only the TPU-flagship variant "
                         "(deformable_groups=1)")
    ap.add_argument("--groups", type=int, default=None,
                    help="measure only a deformable_groups=N EDVR-M variant "
                         "(the Gd Pareto knob — RESULTS.md round-3 frontier)")
    ap.add_argument("--edvr-l", action="store_true",
                    help="EDVR-L (nf=128, back_RBs=40) supervised training "
                         "step throughput instead of the adapt+infer metric")
    ap.add_argument("--edvr-l-serve", action="store_true",
                    help="EDVR-L adapt+infer serving throughput at Vid4 "
                         "shapes (completes the backbone x workload matrix)")
    ap.add_argument("--tof-serve", action="store_true",
                    help="TOF x4 serving forward throughput (phase-packed "
                         "space-to-depth conv path — ops/conv_s2d.py)")
    ap.add_argument("--duf-serve", action="store_true",
                    help="DUF-16L x4 serving forward throughput at the "
                         "deployed default config (trunk-packing A/B lives "
                         "in tools/duf_serve_bench.py)")
    ap.add_argument("--seq", action="store_true",
                    help="measure the sequence-mode serving path "
                         "(EDVR.forward_seq — per-frame pyramids shared "
                         "across windows, exact) for the chosen config "
                         "instead of the window-batched path")
    ap.add_argument("--adapt-steps", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    _arm_tunnel_watchdog()
    import jax

    from dynavsr_tpu.utils.util import enable_compilation_cache

    enable_compilation_cache()  # reuse AOT executables across driver reruns

    if args.edvr_l:
        _edvr_l_bench(args)
        return
    if args.edvr_l_serve:
        # EDVR-L serving: big activations at 16x5x144x176 — chunk inference
        # into 4-window batches to bound live memory on one 16 GB chip.
        # --seq composes: nf=128 extraction is heavier, so the shared-
        # pyramid dedup should matter more than on EDVR-M.
        fps = _measure_adapt_infer(args, groups=8, nf=128, back=40,
                                   infer_chunk=4, seq=args.seq)
        print(json.dumps({
            "metric": "edvr_l_x4_fps_per_chip_with_adaptation"
                      + ("_seq" if args.seq else ""),
            "value": round(fps, 3),
            "unit": "frames/sec/chip",
            "vs_baseline": None,
            "baseline_kind": "no_published_reference_throughput",
        }))
        return

    if args.tof_serve:
        ms = _measure_tof_serve(args)
        print(json.dumps({
            "metric": "tof_x4_serving_ms_per_window",
            "value": round(ms, 2),
            "unit": "ms/window",
            "vs_baseline": None,
            "baseline_kind": "no_published_reference_throughput",
        }))
        return

    if args.duf_serve:
        ms = _measure_duf_serve(args)
        print(json.dumps({
            "metric": "duf_16l_x4_serving_ms_per_window",
            "value": round(ms, 2),
            "unit": "ms/window",
            "vs_baseline": None,
            "baseline_kind": "no_published_reference_throughput",
        }))
        return

    if args.flagship or args.groups is not None:
        g = 1 if args.flagship else args.groups
        fps = _measure_adapt_infer(args, groups=g, seq=args.seq)
        g = _effective_groups(args, g)  # label what was measured, not asked
        print(json.dumps({
            "metric": f"edvr_m_x4_fps_per_chip_with_adaptation_gd{g}"
                      + ("_flagship" if g == 1 else "")
                      + ("_seq" if args.seq else ""),
            "value": round(fps, 3),
            "unit": "frames/sec/chip",
            "vs_baseline": round(fps / PYTORCH_GPU_FPS_ESTIMATE, 3),
            "baseline_kind": "pytorch_gpu_derived_estimate_unverified",
        }))
        return

    fps = _measure_adapt_infer(args, groups=8, seq=args.seq)
    result = {
        "metric": "edvr_m_x4_fps_per_chip_with_adaptation",
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / PYTORCH_GPU_FPS_ESTIMATE, 3),
        # The reference publishes no throughput numbers (SURVEY.md §6);
        # vs_baseline uses the BASELINE.md-derived (still GPU-unverified)
        # V100-class estimate of this same pipeline.
        "baseline_kind": "pytorch_gpu_derived_estimate_unverified",
    }
    if args.quick:
        # Quick mode coerces Gd (min(g,2)) and tiny shapes — mark the line
        # so its numbers are never diffed against real-config runs.
        result["quick"] = True
    if not args.parity_only:
        # The TPU-flagship and recommended-deployment configs in the SAME
        # driver-captured line (round-2 VERDICT item 2: headline numbers
        # must not live only in prose).
        ffps = _measure_adapt_infer(args, groups=1)
        result["flagship_fps"] = round(ffps, 3)
        result["flagship_vs_baseline"] = round(ffps / PYTORCH_GPU_FPS_ESTIMATE, 3)
        # Sequence-mode serving (EDVR.forward_seq: per-frame pyramids
        # extracted once per clip frame, shared across windows — exact;
        # tests/test_seq_infer.py). Reported on the flagship config where
        # non-DCN convs dominate and the dedup matters most.
        sfps = _measure_adapt_infer(args, groups=1, seq=True)
        result["flagship_seq_fps"] = round(sfps, 3)
        result["flagship_seq_vs_baseline"] = round(
            sfps / PYTORCH_GPU_FPS_ESTIMATE, 3)
        # Gd=2: the measured Pareto point (RESULTS.md round-3 frontier —
        # within 0.35 dB of the Gd=8 parity config at ~2.5x its speed).
        g2 = _measure_adapt_infer(args, groups=2)
        result["gd2_fps"] = round(g2, 3)
        result["gd2_vs_baseline"] = round(g2 / PYTORCH_GPU_FPS_ESTIMATE, 3)
        # Gd=2 + sequence-mode serving: the recommended near-parity
        # deployment config composed with the shared-pyramid dedup — the
        # north-star candidate (SURVEY.md §6: >=5x GPU-estimate at
        # near-parity quality). Round-4 verdict item 1: this composition
        # must ride the driver line, not live in prose.
        g2s = _measure_adapt_infer(args, groups=2, seq=True)
        result["gd2_seq_fps"] = round(g2s, 3)
        result["gd2_seq_vs_baseline"] = round(
            g2s / PYTORCH_GPU_FPS_ESTIMATE, 3)
        # Secondary backbones, driver-captured every round (round-3 review
        # item 2): the adapt+infer PRODUCT fps (same per-clip protocol as
        # the EDVR headline) plus the pure serving forwards. All build the
        # deployed defaults (TOF phase-packed convs; DUF plain trunk).
        result["tof_fps"] = round(
            _measure_backbone_adapt_infer(args, "tof"), 3)
        result["duf_fps"] = round(
            _measure_backbone_adapt_infer(args, "duf"), 3)
        result["tof_serve_ms_per_window"] = round(_measure_tof_serve(args), 2)
        result["duf_serve_ms_per_window"] = round(_measure_duf_serve(args), 2)
    print(json.dumps(result))
    print(f"# backend={jax.default_backend()} devices={jax.device_count()}",
          file=sys.stderr)


def _measure_backbone_adapt_infer(args, arch: str) -> float:
    """TOF/DUF adapt+infer product fps (the same per-clip protocol as the
    EDVR headline: k adaptation steps then 16-window inference, one jitted
    call). Mirrors tools/adapt_bench.py's 'full' leg at the same shapes so
    the default bench line carries driver-captured per-arch coverage for
    ALL THREE backbones (round-3 review item 2), not just their serving
    forwards. Reference protocol: the test_dynavsr per-clip loop applies
    to every backbone (SURVEY.md §3.4)."""
    import jax
    import jax.numpy as jnp

    from dynavsr_tpu.adapt.adaptation import AdaptConfig, make_adapt_and_infer
    from dynavsr_tpu.models.padding import (
        make_model_apply,
        make_mutable_model_apply,
    )

    h, w, scale = 144, 176, 4
    n_windows, n_adapt = 16, 8
    if args.quick:
        h, w, n_windows, n_adapt = 16, 16, 4, 2
    if arch == "tof":
        from dynavsr_tpu.models.tof import TOFlow

        model = TOFlow(dtype=jnp.bfloat16, pre_upscale=True, scale=4)
        which, nframes, chunk = "TOF", 5, 4  # 16 pre-upscaled windows spill
    else:
        from dynavsr_tpu.models.duf import DUF

        model = DUF(scale=4, dense1_layers=3, dtype=jnp.bfloat16)
        which, nframes, chunk = "DUF_16L", 7, 0

    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    lw_shape = (n_windows, nframes, h, w, 3)
    slr = jax.random.uniform(
        ks[1], (n_adapt, nframes, h // scale, w // scale, 3))
    lrc = jax.random.uniform(ks[2], (n_adapt, h, w, 3))
    params = jax.jit(model.init)(
        ks[3], jax.random.uniform(ks[0], (1,) + lw_shape[1:]))
    run = make_adapt_and_infer(
        model,
        AdaptConfig(n_steps=args.adapt_steps, lr=1e-6, infer_chunk=chunk),
        apply_fn=make_model_apply(model, which, scale),
        mutable_apply_fn=make_mutable_model_apply(model, which, scale))
    inputs = [  # inputs[0] = dedicated warmup (tunnel memoization gotcha)
        jax.random.uniform(jax.random.PRNGKey(400 + i), lw_shape)
        for i in range(args.repeats + 1)
    ]
    _force(run(params, slr, lrc, inputs[0]))
    times = []
    for lw in inputs[1:]:
        t0 = time.perf_counter()
        _force(run(params, slr, lrc, lw))
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"# {arch}_adapt_infer shape={lw_shape} "
          f"adapt_steps={args.adapt_steps} best={best:.3f}s "
          f"times={[round(t, 3) for t in times]}", file=sys.stderr)
    return n_windows / best


def _serve_leg(model, params, shape, reps, tag) -> float:
    """Per-call serving measurement: each rep is its own dispatch on a
    distinct, session-unique device-resident input; best-of-reps.

    This is the ONLY timing regime that reproduces across sessions on
    the tunnel (round-4 finding, results_r04/tpu_queue_r4c.log): the
    amortized in-executable fori_loop regime previously used here read
    58->172->243 ms/batch across three sessions for the identical cached
    DUF executable + inputs, while per-call times held to ~1%. Session-
    unique seeds defeat the tunnel's (executable, input) memoization;
    the per-call tunnel dispatch (~10-25 ms) is part of what production
    serving pays per batch, so including it is honest."""
    import jax
    import numpy as np

    b = shape[0]
    f = jax.jit(lambda x: model.apply(params, x)[0, :4, 0, 0])
    base = (os.getpid() * 1000003) ^ (int(time.time()) & 0xFFFFFF)
    inputs = [jax.random.uniform(jax.random.PRNGKey(base + i), shape)
              for i in range(reps + 1)]
    _ = np.asarray(f(inputs[0]))  # compile + warm
    times = []
    for xi in inputs[1:]:
        t0 = time.perf_counter()
        _ = np.asarray(f(xi))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"# {tag} shape={shape} [per-call] {dt*1e3:.1f} ms/batch "
          f"times={[round(t*1e3, 1) for t in times]}", file=sys.stderr)
    return dt / b * 1e3


def _measure_tof_serve(args) -> float:
    """TOF x4 serving forward, ms/window (phase-packed s2d convs — the
    shipped default; per-call A/B: 1.53x over plain,
    results_r04/tof_dispatch_ab_run1.log)."""
    import jax
    import jax.numpy as jnp

    from dynavsr_tpu.models.tof import TOFlow

    b, t, h, w = (1, 3, 48, 64) if args.quick else (4, 7, 576, 704)
    reps = max(2, min(args.repeats, 8))
    model = TOFlow(dtype=jnp.bfloat16)
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    x = jax.random.uniform(ks[0], (b, t, h, w, 3))
    params = jax.jit(model.init)(ks[1], x[:1])
    return _serve_leg(model, params, (b, t, h, w, 3), reps, "tof_serve")


def _measure_duf_serve(args) -> float:
    """DUF-16L x4 serving forward, ms/window, at Vid4 LR shapes (7-frame
    windows — duf.py forward replicates ends). Builds through define_G +
    serving_clone so the bench measures the DEPLOYED eval path (the
    PLAIN trunk — the packed trunk loses the per-call production regime
    at every batch size, 0.83-0.90x; see networks.serving_clone and
    tools/duf_serve_bench.py --dispatch)."""
    import jax
    import jax.numpy as jnp

    from dynavsr_tpu.models.networks import define_G, serving_clone

    b, h, w = (1, 16, 16) if args.quick else (4, 144, 176)
    reps = max(2, min(args.repeats, 8))
    opt_net = {"which_model_G": "DUF_16L", "dtype": "bfloat16"}
    model = serving_clone(define_G({"scale": 4, "network_G": opt_net}),
                          opt_net)
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    x = jax.random.uniform(ks[0], (b, 7, h, w, 3))
    params = jax.jit(model.init)(ks[1], x[:1])
    return _serve_leg(model, params, (b, 7, h, w, 3), reps, "duf_serve")


def _edvr_l_bench(args) -> None:
    """EDVR-L supervised step throughput (VERDICT round-1 item 8; the full
    memory/compile proof incl. the meta step is tools/edvr_l_step_check.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dynavsr_tpu.models.edvr import EDVR
    from dynavsr_tpu.train.trainer import (
        TrainerConfig,
        TrainState,
        make_optimizer,
        make_train_step,
    )

    model = EDVR(nf=128, nframes=5, groups=8, front_RBs=5, back_RBs=40,
                 dtype=jnp.bfloat16)
    b, lq, gt = (2, 16, 64) if args.quick else (4, 64, 256)
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    lqs = jax.random.uniform(ks[0], (b, 5, lq, lq, 3))
    gts = jax.random.uniform(ks[1], (b, gt, gt, 3))
    params = jax.jit(model.init)(ks[2], lqs[:1])
    cfg = TrainerConfig(lr=2e-4)
    state = TrainState.create(apply_fn=model.apply, params=params,
                              tx=make_optimizer(cfg))
    step = make_train_step(model, cfg, donate=False)
    state, logs = step(state, {"LQs": lqs, "GT": gts})
    np.asarray(logs["l_pix"])
    times = []
    for i in range(args.repeats):
        batch = {"LQs": jax.random.uniform(jax.random.PRNGKey(10 + i), lqs.shape),
                 "GT": gts}
        t0 = time.perf_counter()
        state, logs = step(state, batch)
        _ = np.asarray(logs["l_pix"])
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(json.dumps({
        "metric": "edvr_l_train_samples_per_sec_per_chip",
        "value": round(b / best, 3),
        "unit": "samples/sec/chip",
        "vs_baseline": None,
        "baseline_kind": "no_published_reference_throughput",
    }))
    print(f"# edvr_l step best={best:.3f}s batch={b} "
          f"times={[round(t, 3) for t in times]}", file=sys.stderr)


if __name__ == "__main__":
    main()
