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

__all__ = ["define_G"]


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
        # Packed trunk default-ON: measured 2.78x serving win on v5e
        # (results_r03/duf_serve_ab_run2.log; duf.py docstring).
        s2d = opt_net.get("s2d_conv")
        return DUF(scale=scale, dense1_layers=layers, dtype=dt,
                   s2d=True if s2d is None else bool(s2d))
    if which == "MFDN":
        return MFDN(scale=scale, nf=opt_net.get("nf", 64), dtype=dt)
    if which == "SFDN":
        return SFDN(scale=scale, nf=opt_net.get("nf", 64), dtype=dt)
    raise NotImplementedError(f"Generator model [{which}] not recognized")
