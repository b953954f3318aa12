"""MFDN / SFDN — DynaVSR's learned downscaling (degradation) estimators.

Reference role (SURVEY.md §2.1 [H — paper + BASELINE.json]; file/arch
details [L]): a lightweight CNN that, given LR frames, emulates the video's
latent downscaling process and emits the x(1/s) "super-low-res" (SLR)
frames. MFDN consumes the T-frame stack jointly (frame-major channel
concat); SFDN is the single-frame variant.

Design (TPU-first, in the absence of a readable reference file): a few
3x3 conv + ReLU layers at LR resolution, a stride-s conv for the
downscale, two refinement convs, and a residual connection from the
bicubic-downscaled input — so an untrained/weakly-trained estimator
degrades gracefully to bicubic, and training only has to learn the
kernel-specific correction.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from dynavsr_tpu.data.resize import imresize

__all__ = ["MFDN", "SFDN"]


class MFDN(nn.Module):
    """Multi-Frame Downscaling Network: (B, T, H, W, 3) -> (B, T, H/s, W/s, 3)."""

    scale: int = 4
    nf: int = 64
    n_layers: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, h, w, c = x.shape
        base = imresize(x, 1.0 / self.scale)  # bicubic prior
        y = x.transpose(0, 2, 3, 1, 4).reshape(b, h, w, t * c)
        for i in range(self.n_layers):
            y = nn.relu(nn.Conv(self.nf, (3, 3), padding="SAME", dtype=self.dtype,
                                name=f"body{i}")(y))
        y = nn.relu(nn.Conv(self.nf, (3, 3), strides=(self.scale, self.scale),
                            padding=[(1, 1), (1, 1)], dtype=self.dtype,
                            name="down")(y))
        y = nn.relu(nn.Conv(self.nf, (3, 3), padding="SAME", dtype=self.dtype,
                            name="refine0")(y))
        y = nn.Conv(t * c, (3, 3), padding="SAME", dtype=self.dtype,
                    name="out")(y)
        ho, wo = y.shape[1], y.shape[2]
        y = y.reshape(b, ho, wo, t, c).transpose(0, 3, 1, 2, 4)
        return (y + base).astype(jnp.float32)


class SFDN(nn.Module):
    """Single-Frame Downscaling Network: (B, H, W, 3) -> (B, H/s, W/s, 3)."""

    scale: int = 4
    nf: int = 64
    n_layers: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        single = x.ndim == 4
        if not single:  # accept (B, T, ...) too, applied per-frame
            b, t = x.shape[:2]
            x = x.reshape((b * t,) + x.shape[2:])
        base = imresize(x, 1.0 / self.scale)
        y = x
        for i in range(self.n_layers):
            y = nn.relu(nn.Conv(self.nf, (3, 3), padding="SAME", dtype=self.dtype,
                                name=f"body{i}")(y))
        y = nn.relu(nn.Conv(self.nf, (3, 3), strides=(self.scale, self.scale),
                            padding=[(1, 1), (1, 1)], dtype=self.dtype,
                            name="down")(y))
        y = nn.relu(nn.Conv(self.nf, (3, 3), padding="SAME", dtype=self.dtype,
                            name="refine0")(y))
        y = nn.Conv(x.shape[-1], (3, 3), padding="SAME", dtype=self.dtype,
                    name="out")(y)
        out = (y + base).astype(jnp.float32)
        if not single:
            out = out.reshape((b, t) + out.shape[1:])
        return out
