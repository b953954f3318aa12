"""MATLAB-compatible bicubic resize, reformulated as two matmuls.

Parity target: the MATLAB `imresize` algorithm (cubic kernel a=-0.5,
antialiasing when downscaling, symmetric boundary), which the reference
re-implements in Python at data/util.py:imresize_np (SURVEY.md §2.4 [H]).
We implement the same *math* from the MATLAB spec directly — but as a
separable pair of dense weight matrices, so the device version is two
matmuls that XLA tiles onto the MXU instead of a gather loop.

    out = W_h @ img @ W_w.T        (per channel)

The weight matrices are tiny ((out_len, in_len), out_len*P nonzeros) and
cached per (in_len, out_len, antialias) tuple.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resize_weights", "imresize_np", "imresize", "imresize_batched"]


def _cubic(x: np.ndarray) -> np.ndarray:
    """Keys cubic convolution kernel with a = -0.5 (MATLAB's 'cubic')."""
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    inner = 1.5 * ax3 - 2.5 * ax2 + 1.0
    outer = -0.5 * ax3 + 2.5 * ax2 - 4.0 * ax + 2.0
    return np.where(ax <= 1.0, inner, np.where(ax <= 2.0, outer, 0.0))


@functools.lru_cache(maxsize=256)
def resize_weights(in_len: int, out_len: int, antialias: bool = True) -> np.ndarray:
    """Dense (out_len, in_len) float64 interpolation matrix, one axis.

    Matches MATLAB imresize's `contributions`: sample positions
    u = (k+1)/scale + 0.5*(1 - 1/scale) (1-based), kernel widened by 1/scale
    when antialiased downscaling, weights normalized per row, and
    out-of-range taps folded back in by symmetric (mirror) indexing.
    """
    scale = out_len / in_len
    kernel_width = 4.0
    downscale_aa = antialias and scale < 1.0
    if downscale_aa:
        kernel_width /= scale

    # 1-based output coords mapped into input space.
    x = np.arange(1, out_len + 1, dtype=np.float64)
    u = x / scale + 0.5 * (1.0 - 1.0 / scale)
    left = np.floor(u - kernel_width / 2.0)
    p = int(np.ceil(kernel_width)) + 2
    ind = left[:, None] + np.arange(p, dtype=np.float64)[None, :]  # 1-based
    dist = u[:, None] - ind
    if downscale_aa:
        w = scale * _cubic(dist * scale)
    else:
        w = _cubic(dist)
    w = w / w.sum(axis=1, keepdims=True)

    # Symmetric boundary fold (MATLAB: aux = [1:n, n:-1:1]).
    idx0 = ind.astype(np.int64) - 1
    aux = np.concatenate([np.arange(in_len), np.arange(in_len - 1, -1, -1)])
    idx = aux[np.mod(idx0, 2 * in_len)]

    mat = np.zeros((out_len, in_len), dtype=np.float64)
    rows = np.repeat(np.arange(out_len), p)
    np.add.at(mat, (rows, idx.ravel()), w.ravel())
    return mat


def _out_len(in_len: int, scale: float) -> int:
    return int(np.ceil(in_len * scale))


def imresize_np(img: np.ndarray, scale: float, antialiasing: bool = True) -> np.ndarray:
    """Host (numpy) MATLAB-parity bicubic resize.

    img: (H, W) or (H, W, C) float array (any range; linear op).
    Mirrors the behavior of the reference's data/util.py:imresize_np [H].
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    oh, ow = _out_len(h, scale), _out_len(w, scale)
    wh = resize_weights(h, oh, antialiasing)
    ww = resize_weights(w, ow, antialiasing)
    out = np.einsum("oh,hwc->owc", wh, img.astype(np.float64))
    out = np.einsum("pw,owc->opc", ww, out)
    out = out.astype(np.result_type(img.dtype, np.float32))
    return out[..., 0] if squeeze else out


def imresize(img: jax.Array, scale: float, antialiasing: bool = True) -> jax.Array:
    """Device (JAX) MATLAB-parity bicubic resize for (..., H, W, C) arrays.

    Static-shape, jit-safe: the weight matrices are baked in as constants,
    and the resize itself is two matmuls (MXU-friendly).
    """
    h, w = img.shape[-3], img.shape[-2]
    oh, ow = _out_len(h, scale), _out_len(w, scale)
    wh = jnp.asarray(resize_weights(h, oh, antialiasing), dtype=jnp.float32)
    ww = jnp.asarray(resize_weights(w, ow, antialiasing), dtype=jnp.float32)
    x = img.astype(jnp.float32)
    # highest precision: this op defines dataset parity; never bf16 it.
    x = jnp.einsum("oh,...hwc->...owc", wh, x, precision="highest")
    x = jnp.einsum("pw,...owc->...opc", ww, x, precision="highest")
    return x.astype(img.dtype) if jnp.issubdtype(img.dtype, jnp.floating) else x


def imresize_batched(img: jax.Array, scale: float, antialiasing: bool = True) -> jax.Array:
    """Alias of imresize (it already broadcasts over leading dims)."""
    return imresize(img, scale, antialiasing)
