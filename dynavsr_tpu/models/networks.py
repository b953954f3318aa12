"""Network factory — reference models/networks.py:define_G [H].

String dispatch on opt['network_G']['which_model_G'] so reference YAML
configs port 1:1. Returns an (un-initialized) flax module; callers init
params with module.init(rng, example_input).
"""

from __future__ import annotations

from typing import Any, Mapping

from dynavsr_tpu.models.downscaler import MFDN, SFDN
from dynavsr_tpu.models.duf import DUF
from dynavsr_tpu.models.edvr import EDVR
from dynavsr_tpu.models.tof import TOFlow

__all__ = ["define_G", "serving_clone"]


def serving_clone(netG, opt_net: Mapping | None):
    """Pure-serving (no-gradient eval) variant of a define_G net.

    Currently the identity: the DUF channel-major packed trunk this hook
    was built for turned out to LOSE the production serving regime. The
    round-3/4a "1.6-5.2x packed win" came from the amortized
    in-executable fori_loop timing regime, which round 4b showed is not
    reproducible across sessions on the TPU tunnel (the identical cached
    executable + inputs read 58->172->243 ms/batch across three
    sessions — results_r04/tpu_queue_r4c.log). In the per-call regime
    (one dispatch per batch of distinct windows — what serving actually
    does, and stable to ~1% across sessions), the PLAIN trunk wins at
    every batch size: B=2 0.90x, B=4 0.88x, B=8 0.85x, B=16 0.83x
    (packed/plain; results_r04/duf_dispatch_*.log), consistent with the
    product-level adapt_bench (plain infer 10.3 ms/window vs packed
    12.8). The packed trunk remains available as an explicit
    network_G.s2d_conv opt-in (parity-tested, identical param pytree);
    the hook is kept so eval call-sites stay declarative about which
    schedule they want. TOF's phase-packed conv path is unaffected: its
    1.5-1.6x win holds in BOTH regimes
    (results_r04/tof_dispatch_ab_run1.log)."""
    return netG


def _dtype(opt_net):
    """network_G.dtype: 'bfloat16' activates the bf16 compute path (params
    stay fp32; MXU runs bf16 — the TPU-flagship serving mode)."""
    import jax.numpy as jnp

    name = opt_net.get("dtype")
    if name in (None, "float32", "fp32"):
        return None
    if name in ("bfloat16", "bf16"):
        return jnp.bfloat16
    raise ValueError(f"unknown network dtype {name!r}")


def define_G(opt: Mapping[str, Any]):
    """opt: full config dict (reference-style). Uses opt['network_G']."""
    opt_net = opt["network_G"]
    which = opt_net["which_model_G"]
    scale = opt.get("scale", 4)
    dt = _dtype(opt_net)

    if which == "EDVR":
        return EDVR(
            nf=opt_net.get("nf", 64),
            nframes=opt_net.get("nframes", 5),
            groups=opt_net.get("groups", 8),
            front_RBs=opt_net.get("front_RBs", 5),
            back_RBs=opt_net.get("back_RBs", 10),
            center=opt_net.get("center"),
            predeblur=bool(opt_net.get("predeblur", False)),
            hr_in=bool(opt_net.get("HR_in", False)),
            w_TSA=opt_net.get("w_TSA", True) is not False,
            dtype=dt,
        )
    if which == "TOF":
        s2d = opt_net.get("s2d_conv")
        return TOFlow(dtype=dt, scale=scale,
                      pre_upscale=bool(opt_net.get("pre_upscale")),
                      s2d=True if s2d is None else bool(s2d))
    if which in ("DUF_16L", "DUF_28L", "DUF_52L"):
        layers = {"DUF_16L": 3, "DUF_28L": 9, "DUF_52L": 21}[which]
        # PLAIN trunk for ALL workloads. The round-3 "packed trunk wins
        # serving" result was a timing-regime artifact (amortized fori_loop
        # numbers do not reproduce across sessions — results_r04/
        # tpu_queue_r4c.log); in the session-reproducible per-call regime
        # packed LOSES serving at every batch size (0.83-0.90x,
        # results_r04/duf_dispatch_*.log) and its backward is ~2.4x slower
        # (duf_packed_adapt_bench.log). serving_clone() is the identity for
        # DUF; s2d_conv in YAML is the explicit opt-in (kept as the A/B
        # record, models/duf.py:146-155).
        return DUF(scale=scale, dense1_layers=layers, dtype=dt,
                   s2d=bool(opt_net.get("s2d_conv", False)))
    if which == "MFDN":
        return MFDN(scale=scale, nf=opt_net.get("nf", 64), dtype=dt)
    if which == "SFDN":
        return SFDN(scale=scale, nf=opt_net.get("nf", 64), dtype=dt)
    raise NotImplementedError(f"Generator model [{which}] not recognized")
