"""PixelShuffle (depth-to-space) with PyTorch channel ordering.

The channel unpacking order must match torch.nn.PixelShuffle so that
converted reference checkpoints produce identical upsampled outputs
(SURVEY.md §7 hard-part #4): for NCHW torch, out[c, h*r+dy, w*r+dx] =
in[c*r*r + dy*r + dx, h, w]. We carry the same channel order in NHWC.
"""

from __future__ import annotations

import jax

__all__ = ["pixel_shuffle"]


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """x: (..., H, W, C*r*r) -> (..., H*r, W*r, C), torch ordering."""
    *lead, h, w, crr = x.shape
    c = crr // (r * r)
    if c * r * r != crr:
        raise ValueError(f"channels {crr} not divisible by r^2={r*r}")
    x = x.reshape(*lead, h, w, c, r, r)  # (..., h, w, c, dy, dx)
    # -> (..., h, dy, w, dx, c)
    nd = x.ndim
    perm = tuple(range(nd - 5)) + (nd - 5, nd - 2, nd - 4, nd - 1, nd - 3)
    x = x.transpose(perm)
    return x.reshape(*lead, h * r, w * r, c)
