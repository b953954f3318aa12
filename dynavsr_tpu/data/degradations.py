"""Degradation synthesis: Gaussian blur kernels + downsampling, on device.

Reference behavior (SURVEY.md §2.4, §3.5 [H — paper]): DynaVSR trains its
MFDN/SFDN estimators and meta-trains the VSR net on synthetic degradations —
per-clip random isotropic/anisotropic Gaussian kernels k, with
LR = (HR * k) ds  and  SLR = (LR * k) ds  (same kernel twice), plus the
MATLAB-bicubic path and DUF's fixed Gaussian pre-blur (data/util.py:
duf_downsample [H]).

TPU-first design: kernels are sampled with jax.random *inside jit* so a whole
batch of degradations is synthesized on device per step (no host RNG in the
hot loop); the blur is a depthwise conv (XLA maps it onto the MXU), and the
subsample is a strided slice. Everything is static-shape.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dynavsr_tpu.data.resize import imresize

__all__ = [
    "isotropic_kernel",
    "anisotropic_kernel",
    "random_kernel_batch",
    "blur_downsample",
    "bicubic_downsample",
    "duf_downsample",
    "synthesize_pair",
]


def _grid(size: int):
    r = (size - 1) / 2.0
    ax = jnp.arange(size, dtype=jnp.float32) - r
    return jnp.meshgrid(ax, ax, indexing="ij")  # (y, x)


def isotropic_kernel(size: int, sigma) -> jax.Array:
    """(size, size) normalized isotropic Gaussian; sigma may be traced."""
    y, x = _grid(size)
    k = jnp.exp(-(x * x + y * y) / (2.0 * jnp.asarray(sigma, jnp.float32) ** 2))
    return k / jnp.sum(k)


def anisotropic_kernel(size: int, sigma_x, sigma_y, theta) -> jax.Array:
    """(size, size) anisotropic Gaussian: axis sigmas + rotation theta."""
    y, x = _grid(size)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    # Rotate coordinates into the kernel frame.
    xr = ct * x + st * y
    yr = -st * x + ct * y
    k = jnp.exp(-0.5 * ((xr / sigma_x) ** 2 + (yr / sigma_y) ** 2))
    return k / jnp.sum(k)


def random_kernel_batch(
    key: jax.Array,
    batch: int,
    size: int = 13,
    sigma_range: Tuple[float, float] = (0.2, 4.0),
    aniso_prob: float = 0.5,
) -> jax.Array:
    """(batch, size, size) random Gaussian kernels, sampled on device.

    Mirrors the reference's meta_learner kernel sampler (SURVEY.md §2.4
    [behavior H, ranges L]): isotropic sigma ~ U(range), or anisotropic with
    independent axis sigmas and uniform rotation, chosen with aniso_prob.
    """
    k_iso, k_sig, k_th, k_choice = jax.random.split(key, 4)
    sig_iso = jax.random.uniform(k_iso, (batch,), minval=sigma_range[0], maxval=sigma_range[1])
    sig_xy = jax.random.uniform(k_sig, (batch, 2), minval=sigma_range[0], maxval=sigma_range[1])
    theta = jax.random.uniform(k_th, (batch,), minval=0.0, maxval=np.pi)
    use_aniso = jax.random.uniform(k_choice, (batch,)) < aniso_prob

    iso = jax.vmap(lambda s: isotropic_kernel(size, s))(sig_iso)
    aniso = jax.vmap(lambda s, t: anisotropic_kernel(size, s[0], s[1], t))(sig_xy, theta)
    return jnp.where(use_aniso[:, None, None], aniso, iso)


def _reflect_pad_hw(x: jax.Array, ph: int, pw: int) -> jax.Array:
    pad = [(0, 0)] * (x.ndim - 3) + [(ph, ph), (pw, pw), (0, 0)]
    return jnp.pad(x, pad, mode="reflect")


def _depthwise_blur(x: jax.Array, kernel: jax.Array, stride: int = 1) -> jax.Array:
    """x: (B, H, W, C), kernel: (kh, kw). VALID conv, per-channel."""
    c = x.shape[-1]
    kh, kw = kernel.shape
    w = jnp.broadcast_to(kernel[:, :, None, None], (kh, kw, 1, c)).astype(x.dtype)
    # HIGHEST precision: degradation synthesis is a parity-critical path and
    # tiny next to model compute — never let the MXU run it in bf16.
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )


def blur_downsample(x: jax.Array, kernel: jax.Array, scale: int) -> jax.Array:
    """LR = (x * kernel) downsampled by `scale`.

    x: (B, H, W, C) or (B, T, H, W, C); kernel: (k, k) shared or (B, k, k)
    per-sample. Reflect-pad so the blur is centered, then subsample the
    grid points 0, s, 2s, ... (self-consistent convention used for both the
    LR and SLR legs, which is what the DynaVSR algorithm requires).
    """
    video = x.ndim == 5
    if video:
        b, t = x.shape[:2]
        x = x.reshape((b * t,) + x.shape[2:])
        if kernel.ndim == 3:
            kernel = jnp.repeat(kernel, t, axis=0)
    if kernel.ndim == 2:
        kh, kw = kernel.shape
        xp = _reflect_pad_hw(x, kh // 2, kw // 2)
        out = _depthwise_blur(xp, kernel, stride=scale)
    else:
        kh, kw = kernel.shape[-2:]
        xp = _reflect_pad_hw(x, kh // 2, kw // 2)
        out = jax.vmap(lambda xi, ki: _depthwise_blur(xi[None], ki, stride=scale)[0])(xp, kernel)
    if video:
        out = out.reshape((b, t) + out.shape[1:])
    return out


def bicubic_downsample(x: jax.Array, scale: int) -> jax.Array:
    """MATLAB-bicubic downscale by 1/scale (antialiased), (..., H, W, C)."""
    return imresize(x, 1.0 / scale, antialiasing=True)


@functools.lru_cache(maxsize=8)
def _duf_kernel_np(scale: int) -> np.ndarray:
    """13x13 DUF Gaussian: impulse response of a sigma=0.4*scale separable
    Gaussian truncated at radius int(4*sigma+0.5), embedded in 13 taps —
    identical to the reference's scipy.gaussian_filter construction [H]."""
    sigma = 0.4 * scale
    radius = int(4.0 * sigma + 0.5)
    xs = np.arange(-radius, radius + 1, dtype=np.float64)
    g = np.exp(-0.5 * (xs / sigma) ** 2)
    g /= g.sum()
    full = np.zeros(13, dtype=np.float64)
    c = 6
    lo, hi = max(0, c - radius), min(13, c + radius + 1)
    src_lo = lo - (c - radius)
    full[lo:hi] = g[src_lo : src_lo + (hi - lo)]
    return np.outer(full, full)


def duf_downsample(x: jax.Array, scale: int = 4) -> jax.Array:
    """DUF's blur-matched downsample; parity with data/util.py:duf_downsample.

    x: (..., H, W, C). Reflect-pad by 6 + 2*scale (plus remainder for
    scale 3), 13x13 Gaussian conv with stride=scale, then crop 2 px.
    """
    if scale not in (2, 3, 4):
        raise ValueError(f"scale {scale} not supported")
    lead = x.shape[:-3]
    h, w, c = x.shape[-3:]
    xf = x.reshape((-1, h, w, c))
    pad = 6 + scale * 2
    r_h = (-h) % scale if scale == 3 else 0
    r_w = (-w) % scale if scale == 3 else 0
    xp = jnp.pad(xf, [(0, 0), (pad, pad + r_h), (pad, pad + r_w), (0, 0)], mode="reflect")
    k = jnp.asarray(_duf_kernel_np(scale), dtype=xf.dtype)
    out = _depthwise_blur(xp, k, stride=scale)
    out = out[:, 2:-2, 2:-2, :]
    return out.reshape(lead + out.shape[1:])


def synthesize_pair(key: jax.Array, hr: jax.Array, scale: int, size: int = 13,
                    sigma_range: Tuple[float, float] = (0.2, 4.0),
                    aniso_prob: float = 0.5,
                    noise_range: Tuple[float, float] = (0.0, 0.0)):
    """Device-side (LR, SLR, kernel) triple from an HR clip batch.

    hr: (B, T, H, W, C). One random kernel per *clip* (shared across its
    frames, like the reference's per-clip sampling), applied twice:
    LR = (HR*k) ds, SLR = (LR*k) ds. Fully jit-able.

    noise_range: per-clip additive-Gaussian read-noise sigma ~ U(range)
    applied to LR (the observation), clipped to [0,1]; SLR is then the
    clean blur-down of the NOISY LR — exactly how a real noisy video's
    pseudo-task is built at test time (tools/blind_adaptation_check.py
    noise legs). (0, 0) = reference behavior (blur only). This is a
    beyond-reference extension: the paper/reference synthesize blur-only
    degradations, and the robustness matrix (RESULTS.md) measures what
    noise-blind training costs.
    """
    b = hr.shape[0]
    # Kernels draw from the RAW key (not a split of it): same-seed runs
    # must reproduce the pre-noise-feature kernel stream (the committed
    # round-3 artifacts), and the draw must not depend on noise_range
    # (controlled noise A/Bs see identical kernels). Noise keys are
    # fold_in-derived — safe alongside the direct use of `key`.
    kernels = random_kernel_batch(key, b, size, sigma_range, aniso_prob)
    lr = blur_downsample(hr, kernels, scale)
    if noise_range[1] > 0.0:
        k_sig = jax.random.fold_in(key, 1)
        k_noise = jax.random.fold_in(key, 2)
        nsig = jax.random.uniform(
            k_sig, (b,), minval=noise_range[0], maxval=noise_range[1])
        shaped = nsig.reshape((b,) + (1,) * (lr.ndim - 1)).astype(lr.dtype)
        lr = lr + shaped * jax.random.normal(k_noise, lr.shape, lr.dtype)
        lr = jnp.clip(lr, 0.0, 1.0)
    slr = blur_downsample(lr, kernels, scale)
    return lr, slr, kernels
