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
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

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


class _DenseLayer(nn.Module):
    """bn-relu-conv1x1x1 -> bn-relu-conv3x3x3, concat (DUF dense unit [H])."""

    growth: int = 32
    t_valid: bool = False
    train: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = nn.BatchNorm(use_running_average=not self.train, name="bn1")(x)
        y = nn.relu(y)
        y = _conv3d(x.shape[-1], (1, 1, 1), "conv1", self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not self.train, name="bn2")(y)
        y = nn.relu(y)
        y = _conv3d(self.growth, (3, 3, 3), "conv2", self.dtype, t_valid=self.t_valid)(y)
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

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, h, w, c = x.shape
        r2 = self.scale**2
        x_center = x[:, t // 2]

        fea = _conv3d(64, (1, 3, 3), "conv3d_1", self.dtype)(x)
        for i in range(self.dense1_layers):
            fea = _DenseLayer(self.growth, False, self.train, self.dtype,
                              name=f"dense1_{i}")(fea)
        for i in range(3):  # T: 7 -> 5 -> 3 -> 1
            fea = _DenseLayer(self.growth, True, self.train, self.dtype,
                              name=f"dense2_{i}")(fea)
        fea = nn.BatchNorm(use_running_average=not self.train, name="bn3d_2")(fea)
        fea = nn.relu(fea)
        fea = nn.relu(_conv3d(256, (1, 3, 3), "conv3d_2", self.dtype)(fea))

        res = nn.relu(_conv3d(256, (1, 1, 1), "conv3d_r1", self.dtype)(fea))
        res = _conv3d(3 * r2, (1, 1, 1), "conv3d_r2", self.dtype)(res)[:, 0]

        filt = nn.relu(_conv3d(512, (1, 1, 1), "conv3d_f1", self.dtype)(fea))
        filt = _conv3d(25 * r2, (1, 1, 1), "conv3d_f2", self.dtype)(filt)[:, 0]
        filt = jax.nn.softmax(filt.reshape(b, h, w, 25, r2), axis=3)

        out = dynamic_upsampling_filter(x_center, filt) + res
        return pixel_shuffle(out, self.scale).astype(jnp.float32)
