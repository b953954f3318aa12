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

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["mod_pad_apply", "arch_mod"]


def arch_mod(which: str) -> int:
    """Spatial divisibility requirement per architecture."""
    if which == "EDVR":
        return 4
    if which == "TOF":
        return 8  # 4-level SpyNet on the pre-upscaled input
    return 1


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
