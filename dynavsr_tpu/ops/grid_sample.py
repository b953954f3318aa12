"""Bilinear sampling & flow warping (pure JAX, gather-based).

Replaces the reference's torch F.grid_sample(mode='bilinear',
padding_mode='zeros', align_corners=True) used by arch_util.flow_warp
(SURVEY.md §2.1 [H]). TOF/SpyNet consume this; no Pallas needed — XLA
lowers the 4-tap gather well, and the op is a tiny share of TOF's FLOPs.

Convention: `coords` are *unnormalized* pixel coordinates (y, x) into the
input; samples outside [0, size-1] fade to zero exactly like torch's
zeros-padding bilinear (partial contributions at the border).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["bilinear_sample", "grid_sample", "flow_warp"]


def bilinear_sample(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Sample img (H, W, C) at float positions ys/xs (...,) -> (..., C).

    Zero padding outside the image; each of the 4 corner taps contributes
    only if it lies inside (matches CUDA dmcn_im2col_bilinear / torch
    grid_sample zeros semantics).
    """
    h, w, _ = img.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy1 = ys - y0
    wx1 = xs - x0
    wy0 = 1.0 - wy1
    wx0 = 1.0 - wx1

    flat = img.reshape(h * w, -1)

    def tap(yi, xi, wgt):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        vals = jnp.take(flat, yc * w + xc, axis=0)
        return vals * (wgt * inside.astype(img.dtype))[..., None]

    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    out = tap(y0i, x0i, wy0 * wx0)
    out += tap(y0i, x0i + 1, wy0 * wx1)
    out += tap(y0i + 1, x0i, wy1 * wx0)
    out += tap(y0i + 1, x0i + 1, wy1 * wx1)
    return out


def grid_sample(x: jax.Array, coords: jax.Array) -> jax.Array:
    """Batched sampler. x: (B, H, W, C); coords: (B, Ho, Wo, 2) as (y, x)
    unnormalized pixel positions. Returns (B, Ho, Wo, C)."""
    return jax.vmap(lambda img, c: bilinear_sample(img, c[..., 0], c[..., 1]))(x, coords)


def flow_warp(x: jax.Array, flow: jax.Array) -> jax.Array:
    """Warp x by optical flow (reference arch_util.flow_warp [H]).

    x: (B, H, W, C); flow: (B, H, W, 2) as (dx, dy) displacement in pixels
    (the torch convention: flow[..., 0] is horizontal). Output pixel (i, j)
    samples x at (i + dy, j + dx), zeros outside.
    """
    b, h, w, _ = x.shape
    gy = jnp.arange(h, dtype=flow.dtype)
    gx = jnp.arange(w, dtype=flow.dtype)
    grid_y, grid_x = jnp.meshgrid(gy, gx, indexing="ij")
    ys = grid_y[None] + flow[..., 1]
    xs = grid_x[None] + flow[..., 0]
    return jax.vmap(bilinear_sample)(x, ys, xs)
