"""DUF: Dynamic Upsampling Filters over a 3D-conv dense trunk (NDHWC).

Reference: models/archs/DUF_arch.py (SURVEY.md §2.1 [H]; exact per-variant
layer counts [M]) — a 3D-conv dense trunk over the (T=7)-frame stack, then
two heads: a per-pixel 5x5 dynamic filter bank (softmaxed over the 25 taps,
one filter per output sub-pixel) applied to the center frame, plus a
residual; depth-to-space x scale. Input must be blur-matched
(data/degradations.duf_downsample) and eval crops ~8 border px.

TPU notes: 3D convs lower to lax.conv_general_dilated over NDHWC (MXU);
the dynamic-filter application is extract-patches + einsum — a batched
matmul, not a gather.

s2d=True runs the dense trunk in the spatially phase-packed CHANNEL-major
domain (ops/conv_s2d.py _cm family): the trunk's 3x3x3 convs have
cout = growth = 32 (1/4 of the MXU's 128 output lanes) and carry ~80% of
DUF-16L's serving FLOPs, the same lane starvation the packed path fixed
for TOF (1.59x end-to-end — RESULTS.md). Channel-major packing makes the
dense concat a layout no-op, so the whole trunk stays packed: one
stride-2 entry at conv3d_1, packed 1x1x1 / 3x3x3 middles, BatchNorm on
the free (..., C, 4) view (exact per-channel statistics, train AND eval),
one depth-to-space exit before the full-lane 256-channel tail (where
packing would only inflate FLOPs). Param/variable pytree is identical to
the plain path — checkpoints interchangeable, torch-importable.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from dynavsr_tpu.ops.conv_s2d import (
    ConvParams,
    conv_packed_1x1_cm,
    conv_s2d_enter_3d_cm,
    conv_s2d_packed_3d_cm,
    depth_to_space_cm,
)
from dynavsr_tpu.ops.pixelshuffle import pixel_shuffle

__all__ = ["DUF", "dynamic_upsampling_filter"]


def dynamic_upsampling_filter(x: jax.Array, filters: jax.Array) -> jax.Array:
    """Apply per-pixel 5x5 filters to each channel of x.

    x: (B, H, W, 3) center frame; filters: (B, H, W, 25, R) softmax-normalized
    over the 25 taps (R = scale**2 sub-pixel filters per position).
    Returns (B, H, W, 3*R) with torch's c*R+r channel order (ready for
    pixel_shuffle). Reference: DUF_arch.DynamicUpsamplingFilter_3C [H].
    """
    b, h, w, c = x.shape
    xp = jnp.pad(x, [(0, 0), (2, 2), (2, 2), (0, 0)])
    # 25 shifted views -> (B, H, W, 25, C); tap order row-major like unfold.
    patches = jnp.stack(
        [xp[:, i : i + h, j : j + w, :] for i in range(5) for j in range(5)], axis=3
    )
    out = jnp.einsum("bhwkc,bhwkr->bhwcr", patches, filters,
                     preferred_element_type=jnp.float32)
    return out.reshape(b, h, w, c * filters.shape[-1]).astype(x.dtype)


def _conv3d(features, kernel, name, dtype=None, t_valid=False):
    kt, kh, kw = kernel
    pad_t = (0, 0) if (t_valid or kt == 1) else ((kt - 1) // 2, (kt - 1) // 2)
    return nn.Conv(features, (kt, kh, kw),
                   padding=[pad_t, ((kh - 1) // 2,) * 2, ((kw - 1) // 2,) * 2],
                   dtype=dtype, name=name)


def _conv3d_apply(y, k, b, dtype, t_valid=False):
    """Functional NDHWC conv matching _conv3d/nn.Conv semantics exactly
    (same padding rule, params cast to the compute dtype)."""
    kt, kh, kw = k.shape[0], k.shape[1], k.shape[2]
    pad_t = (0, 0) if (t_valid or kt == 1) else ((kt - 1) // 2, (kt - 1) // 2)
    y = jax.lax.conv_general_dilated(
        y.astype(dtype), k.astype(dtype), (1, 1, 1),
        [pad_t, ((kh - 1) // 2,) * 2, ((kw - 1) // 2,) * 2],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return y + b.astype(y.dtype)


def _bn_relu(bn, y, c, packed, dtype):
    """BN+ReLU; with packed=True the BatchNorm (built with axis=-2) runs on
    the free (..., C, 4) channel-major view — the 4 phases re-tile the same
    pixel set, so per-channel statistics are exact in train and eval."""
    if packed:
        v = bn(y.reshape(y.shape[:-1] + (c, 4)))
        return nn.relu(v).reshape(y.shape).astype(dtype)
    return nn.relu(bn(y)).astype(dtype)


class _DenseLayer(nn.Module):
    """bn-relu-conv1x1x1 -> bn-relu-conv3x3x3, concat (DUF dense unit [H]).

    With s2d=True, x is the spatially packed channel-major tensor
    (B, T, H/2, W/2, 4C); both convs run packed->packed and the dense
    concat is layout-free (channel-major blocks concatenate natively)."""

    growth: int = 32
    t_valid: bool = False
    train: bool = False
    dtype: Any = None
    s2d: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1] // (4 if self.s2d else 1)
        dtype = self.dtype or x.dtype
        ax = -2 if self.s2d else -1
        bn1 = nn.BatchNorm(use_running_average=not self.train, axis=ax,
                           name="bn1")
        bn2 = nn.BatchNorm(use_running_average=not self.train, axis=ax,
                           name="bn2")
        k1, b1 = ConvParams(c, (1, 1, 1), name="conv1")(c)
        k2, b2 = ConvParams(self.growth, (3, 3, 3), name="conv2")(c)
        y = _bn_relu(bn1, x, c, self.s2d, dtype)
        if self.s2d:
            y = conv_packed_1x1_cm(y, k1.astype(dtype), b1.astype(dtype))
            y = _bn_relu(bn2, y, c, True, dtype)
            y = conv_s2d_packed_3d_cm(y, k2.astype(dtype), b2.astype(dtype),
                                      t_valid=self.t_valid)
        else:
            y = _conv3d_apply(y, k1, b1, dtype)
            y = _bn_relu(bn2, y, c, False, dtype)
            y = _conv3d_apply(y, k2, b2, dtype, t_valid=self.t_valid)
        if self.t_valid:
            x = x[:, 1:-1]  # align T for the dense concat
        return jnp.concatenate([x, y], axis=-1)


class DUF(nn.Module):
    """DUF_16L / 28L / 52L via dense1_layers = 3 / 9 / 21 [M].

    x: (B, T=7, H, W, 3) blur-matched LR frames -> (B, H*s, W*s, 3).
    """

    scale: int = 4
    dense1_layers: int = 3  # 16L:3, 28L:9, 52L:21
    growth: int = 32
    train: bool = False
    dtype: Any = None
    # Packed-trunk schedule (module docstring): OFF for every workload.
    # A measured negative kept as an opt-in (network_G.s2d_conv): in the
    # session-reproducible per-call regime the packed forward LOSES at
    # every batch size (0.83-0.90x, results_r04/duf_dispatch_*.log) and
    # the backward is ~2.4x slower (duf_packed_adapt_bench.log). The
    # earlier "1.6-5.2x packed win" (duf_serve_batch_sweep.log) was an
    # artifact of the amortized fori_loop timing regime, which does not
    # reproduce across sessions on the tunnel (networks.serving_clone
    # docstring). Falls back to plain automatically on odd spatial sizes.
    s2d: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, h, w, c = x.shape
        r2 = self.scale**2
        x_center = x[:, t // 2]
        packed = self.s2d and h % 2 == 0 and w % 2 == 0
        dtype = self.dtype or x.dtype

        k1, b1 = ConvParams(64, (1, 3, 3), name="conv3d_1")(c)
        if packed:
            fea = conv_s2d_enter_3d_cm(
                x.astype(dtype), k1.astype(dtype), b1.astype(dtype))
        else:
            fea = _conv3d_apply(x, k1, b1, dtype)
        for i in range(self.dense1_layers):
            fea = _DenseLayer(self.growth, False, self.train, self.dtype,
                              packed, name=f"dense1_{i}")(fea)
        for i in range(3):  # T: 7 -> 5 -> 3 -> 1
            fea = _DenseLayer(self.growth, True, self.train, self.dtype,
                              packed, name=f"dense2_{i}")(fea)
        cfin = fea.shape[-1] // (4 if packed else 1)
        bn3 = nn.BatchNorm(use_running_average=not self.train,
                           axis=-2 if packed else -1, name="bn3d_2")
        fea = _bn_relu(bn3, fea, cfin, packed, dtype)
        if packed:
            # Exit BEFORE the 256-channel tail: those convs already fill
            # the MXU lanes, so packing them would only pay the (T/K)^2
            # FLOP inflation for nothing.
            fea = depth_to_space_cm(fea)
        fea = nn.relu(_conv3d(256, (1, 3, 3), "conv3d_2", self.dtype)(fea))

        res = nn.relu(_conv3d(256, (1, 1, 1), "conv3d_r1", self.dtype)(fea))
        res = _conv3d(3 * r2, (1, 1, 1), "conv3d_r2", self.dtype)(res)[:, 0]

        filt = nn.relu(_conv3d(512, (1, 1, 1), "conv3d_f1", self.dtype)(fea))
        filt = _conv3d(25 * r2, (1, 1, 1), "conv3d_f2", self.dtype)(filt)[:, 0]
        filt = jax.nn.softmax(filt.reshape(b, h, w, 25, r2), axis=3)

        out = dynamic_upsampling_filter(x_center, filt) + res
        return pixel_shuffle(out, self.scale).astype(jnp.float32)
