"""Modulated deformable convolution v2 — pure-JAX reference (parity oracle).

Semantics match the reference CUDA extension
models/archs/dcn/src/deform_conv_cuda_kernel.cu (SURVEY.md §2.2 [H]):

  out(p) = sum_k w_k * m_k(p) * x( p*stride - pad + d*k + dp_k(p) )

with bilinear sampling, zero contribution for taps outside the image, and
the CUDA channel layouts kept *exactly* so converted checkpoints work:
  offset: (..., 2 * G_d * K) where channel 2*(g*K + k) is dy and
          2*(g*K + k) + 1 is dx for deformable group g, tap k (row-major
          over the kernel window).
  mask:   (..., G_d * K), already sigmoid-ed by the caller.

Design: vectorized bilinear gather builds interpolated im2col columns
(B, Ho, Wo, K, Cin); a single einsum against the HWIO weight does the GEMM
(MXU). This is the correctness oracle and the autodiff-everything fallback —
the Pallas kernel (ops/dcn_pallas.py) must match it bit-for-bit-ish.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["deform_conv2d_ref", "dcn_columns"]


def _out_size(size: int, k: int, stride: int, pad: int, dil: int) -> int:
    return (size + 2 * pad - dil * (k - 1) - 1) // stride + 1


def dcn_columns(
    x: jax.Array,
    offset: jax.Array,
    mask: Optional[jax.Array],
    kernel_size: tuple,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    deformable_groups: int = 1,
) -> jax.Array:
    """Interpolated, modulated im2col columns: (B, Ho, Wo, K, Cin).

    x: (B, H, W, Cin); offset: (B, Ho, Wo, 2*G_d*K); mask: (B, Ho, Wo, G_d*K)
    or None (treated as all-ones, i.e. non-modulated DCNv1).
    """
    b, h, w, cin = x.shape
    kh, kw = kernel_size
    k = kh * kw
    gd = deformable_groups
    ho = _out_size(h, kh, stride, padding, dilation)
    wo = _out_size(w, kw, stride, padding, dilation)
    cg = cin // gd

    # Base sampling positions per output pixel and tap: (Ho, Wo, K)
    oy = jnp.arange(ho, dtype=x.dtype) * stride - padding
    ox = jnp.arange(wo, dtype=x.dtype) * stride - padding
    ty = jnp.arange(kh, dtype=x.dtype) * dilation
    tx = jnp.arange(kw, dtype=x.dtype) * dilation
    base_y = oy[:, None, None, None] + ty[None, None, :, None]  # (Ho,1,kh,1)
    base_x = ox[None, :, None, None] + tx[None, None, None, :]  # (1,Wo,1,kw)
    base_y = jnp.broadcast_to(base_y, (ho, wo, kh, kw)).reshape(ho, wo, k)
    base_x = jnp.broadcast_to(base_x, (ho, wo, kh, kw)).reshape(ho, wo, k)

    # Per-group offsets: CUDA layout, interleaved (dy, dx) per (g, k).
    off = offset.reshape(b, ho, wo, gd, k, 2)
    dy = off[..., 0]
    dx = off[..., 1]
    ys = base_y[None, :, :, None, :] + dy  # (B, Ho, Wo, Gd, K)
    xs = base_x[None, :, :, None, :] + dx

    from dynavsr_tpu.ops.grid_sample import bilinear_sample

    def sample_one(img, ys_i, xs_i, m_i):
        # img: (H, W, Cin) split into deformable groups; ys/xs: (Ho, Wo, Gd, K)
        imgs = img.reshape(h, w, gd, cg)
        cols = jax.vmap(bilinear_sample, in_axes=(2, 2, 2), out_axes=2)(
            imgs, ys_i, xs_i
        )  # (Ho, Wo, Gd, K, cg)
        if m_i is not None:
            cols = cols * m_i.reshape(ho, wo, gd, k)[..., None]
        return cols.transpose(0, 1, 3, 2, 4).reshape(ho, wo, k, cin)

    if mask is None:
        return jax.vmap(lambda img, y_, x_: sample_one(img, y_, x_, None))(x, ys, xs)
    return jax.vmap(sample_one)(x, ys, xs, mask)


def deform_conv2d_ref(
    x: jax.Array,
    offset: jax.Array,
    mask: Optional[jax.Array],
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    groups: int = 1,
    deformable_groups: int = 1,
) -> jax.Array:
    """Modulated deformable conv. weight: HWIO (kh, kw, Cin//groups, Cout)."""
    kh, kw, cin_g, cout = weight.shape
    cols = dcn_columns(
        x, offset, mask, (kh, kw), stride, padding, dilation, deformable_groups
    )  # (B, Ho, Wo, K, Cin)
    b, ho, wo, k, cin = cols.shape
    if groups == 1:
        out = jnp.einsum(
            "bhwkc,kco->bhwo",
            cols,
            weight.reshape(k, cin_g, cout),
            preferred_element_type=jnp.float32,
        )
    else:
        cols_g = cols.reshape(b, ho, wo, k, groups, cin_g)
        w_g = weight.reshape(k, cin_g, groups, cout // groups)
        out = jnp.einsum(
            "bhwkgc,kcgo->bhwgo",
            cols_g,
            w_g,
            preferred_element_type=jnp.float32,
        ).reshape(b, ho, wo, cout)
    out = out.astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out
