"""Mod-padding for pyramid networks — reference test-script input padding
(EDVR's official eval pads inputs so H, W divide the pyramid factor, then
crops the output; SURVEY.md §2.5 eval row).

EDVR needs H, W % 4 == 0 (3-level pyramid with exact x2 upsampling);
SpyNet/TOF needs % 8 on its (pre-upscaled) input. Without this, e.g. the
DynaVSR pseudo-task input SLR = LR/4 (9x11 for Vid4) breaks the pyramid
reshapes. `mod_pad_apply` reflection-pads the bottom/right, applies, and
crops the scaled output back.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp

__all__ = ["mod_pad_apply", "arch_mod", "tof_raw_mod", "make_model_apply",
           "make_mutable_model_apply"]


def arch_mod(which: str) -> int:
    """Spatial divisibility requirement per architecture."""
    if which == "EDVR":
        return 4
    if which == "TOF":
        return 8  # 4-level SpyNet on the pre-upscaled input
    return 1


def tof_raw_mod(scale: int) -> int:
    """Divisibility required of a RAW-LR input so that the x`scale`
    pre-upscaled frames divide SpyNet's /8 pyramid: H*scale % 8 == 0
    iff H % (8 // gcd(8, scale)) == 0."""
    return 8 // math.gcd(8, int(scale))


def _make_padded_apply(netG, which: Optional[str], scale: int,
                       raw_apply: Optional[Callable], mutable: bool) -> Callable:
    """Shared builder — the ONE place that encodes the per-arch input
    conventions (TOF bicubic pre-upscale unless the module folds it in;
    pyramid mod-padding), so the eval and train-mode forwards can never
    drift apart. `mutable` switches the inner call to train mode with
    mutable batch_stats; the updates tunnel through the padding crop in a
    box and are returned alongside the output."""
    if mutable:
        m = netG.clone(train=True)

        def call(p, x, box):
            out, upd = m.apply(p, x, mutable=["batch_stats"])
            box["upd"] = upd
            return out
    else:
        inner = raw_apply or (lambda p, x: netG.apply(p, x))

        def call(p, x, box):
            return inner(p, x)

    if which == "TOF" and not getattr(netG, "pre_upscale", False):
        from dynavsr_tpu.data.resize import imresize_batched

        def tof_apply(p, x):
            b, n, h, w, c = x.shape
            up = imresize_batched(x.reshape(b * n, h, w, c), float(scale))
            up = up.reshape(b, n, h * scale, w * scale, c)
            box = {}
            out = mod_pad_apply(
                lambda xx: call(p, xx, box), up, mod=arch_mod("TOF"), scale=1)
            return (out, box["upd"]) if mutable else out

        return tof_apply
    mod = tof_raw_mod(scale) if which == "TOF" else arch_mod(which)

    def padded(p, x):
        box = {}
        out = mod_pad_apply(lambda xx: call(p, xx, box), x, mod=mod, scale=scale)
        return (out, box["upd"]) if mutable else out

    return padded


def make_model_apply(netG, which: Optional[str], scale: int,
                     raw_apply: Optional[Callable] = None) -> Callable:
    """(params, raw-LR windows) -> SR, with per-arch input conventions
    (used by eval, the adaptation CLI and the meta trainer): TOF consumes
    bicubically pre-upscaled frames (TOF_arch [H]) — applied externally
    here unless the module folds it in (TOFlow.pre_upscale); pyramid nets
    get mod-padded inputs so arbitrary clip/SLR sizes work like the
    reference's padded eval.
    """
    return _make_padded_apply(netG, which, scale, raw_apply, mutable=False)


def make_mutable_model_apply(netG, which: Optional[str], scale: int) -> Callable:
    """Train-mode variant of make_model_apply for BN nets (TOF/DUF):
    (params, raw-LR windows) -> (SR, {'batch_stats': ...}) with the module
    run in train mode and mutable batch_stats — the forward the reference's
    train()-mode test-time adaptation uses (adapt/adaptation.py
    bn_mode='train_ema'). Same per-arch input conventions as
    make_model_apply, by construction (one shared builder)."""
    return _make_padded_apply(netG, which, scale, None, mutable=True)


def mod_pad_apply(
    apply: Callable[[jax.Array], jax.Array],
    x: jax.Array,
    mod: int,
    scale: int,
) -> jax.Array:
    """apply() over x with H/W (axes -3/-2) reflection-padded to multiples
    of `mod`; output cropped to (H*scale, W*scale).

    x: (..., H, W, C) — typically (B, N, H, W, C) windows.
    """
    h, w = x.shape[-3], x.shape[-2]
    ph = (-h) % mod
    pw = (-w) % mod
    if ph == 0 and pw == 0:
        return apply(x)
    pad = [(0, 0)] * (x.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
    xp = jnp.pad(x, pad, mode="reflect")
    out = apply(xp)
    return out[..., : h * scale, : w * scale, :]
