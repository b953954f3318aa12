"""TOFlow baseline: SpyNet coarse-to-fine flow + warp + fusion (NHWC).

Reference: models/archs/TOF_arch.py (SURVEY.md §2.1 [H]; pre-upscale detail
[M]): operates on bicubically pre-upscaled frames (x4 SR = bicubic-up then
TOFlow refinement), 7-frame septuplet input, ImageNet mean/std
normalization, 4-level SpyNet with 5-conv BN blocks (8->32->64->32->16->2).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from dynavsr_tpu.ops.grid_sample import flow_warp

__all__ = ["SpyNet", "SpyNetBlock", "TOFlow"]

_MEAN = (0.485, 0.456, 0.406)
_STD = (0.229, 0.224, 0.225)


def _avg_pool2(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


class SpyNetBlock(nn.Module):
    """One pyramid-level flow refiner: 5 convs 7x7 with BN+ReLU [H]."""

    train: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        widths = (32, 64, 32, 16)
        for i, f in enumerate(widths):
            x = nn.Conv(f, (7, 7), padding=[(3, 3), (3, 3)], dtype=self.dtype,
                        name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not self.train,
                             momentum=0.9, epsilon=1e-5, name=f"bn{i}")(x)
            x = nn.relu(x)
        return nn.Conv(2, (7, 7), padding=[(3, 3), (3, 3)], dtype=self.dtype,
                       name="conv4")(x)


class SpyNet(nn.Module):
    """4-level coarse-to-fine flow estimator [H].

    ref, nbr: (B, H, W, 3) normalized frames. Returns flow (B, H, W, 2) as
    (dx, dy), the displacement that warps nbr onto ref.
    """

    levels: int = 4
    train: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, ref: jax.Array, nbr: jax.Array) -> jax.Array:
        refs, nbrs = [ref], [nbr]
        for _ in range(self.levels - 1):
            refs.insert(0, _avg_pool2(refs[0]))
            nbrs.insert(0, _avg_pool2(nbrs[0]))

        b, h0, w0, _ = refs[0].shape
        flow = jnp.zeros((b, h0, w0, 2), dtype=ref.dtype)
        for lvl in range(self.levels):
            if lvl > 0:
                shape = flow.shape[:1] + (flow.shape[1] * 2, flow.shape[2] * 2, 2)
                flow = jax.image.resize(flow, shape, method="bilinear") * 2.0
            warped = flow_warp(nbrs[lvl], flow)
            inp = jnp.concatenate([refs[lvl], warped, flow], axis=-1)
            flow = flow + SpyNetBlock(self.train, self.dtype, name=f"block{lvl}")(inp)
        return flow


class TOFlow(nn.Module):
    """TOFlow: normalize, flow each neighbor to center, warp, fuse [H].

    x: (B, 7, H, W, 3) *bicubically pre-upscaled* frames in [0, 1].
    Returns the refined center frame (B, H, W, 3).

    pre_upscale=True folds the bicubic x`scale` front-end INTO the module
    (identical params and numerics — imresize is parameter-free), so TOF
    consumes raw LR under the same contract as EDVR/DUF and every pipeline
    leg (supervised train step, MAML meta step, test-time adaptation,
    eval) works unmodified. The reference keeps the upscale in its data
    pipeline instead (TOF_arch [M]); set network_G.pre_upscale in YAML.
    """

    train: bool = False
    dtype: Any = None
    pre_upscale: bool = False
    scale: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.pre_upscale:
            from dynavsr_tpu.data.resize import imresize_batched

            b0, t0, h0, w0, c0 = x.shape
            up = imresize_batched(
                x.reshape(b0 * t0, h0, w0, c0), float(self.scale))
            x = up.reshape(b0, t0, h0 * self.scale, w0 * self.scale, c0)
        b, t, h, w, c = x.shape
        center = t // 2
        mean = jnp.asarray(_MEAN, x.dtype)
        std = jnp.asarray(_STD, x.dtype)
        xn = (x - mean) / std
        ref = xn[:, center]

        spynet = SpyNet(train=self.train, dtype=self.dtype, name="spynet")
        # NOTE: neighbors are flowed/warped SEQUENTIALLY on purpose. Folding
        # the T-1 neighbors into the batch (the EDVR PCD trick) was measured
        # 2.4x SLOWER here at x4 Vid4 serving shapes: the packed warp's
        # gather source grows 6x and spills VMEM, hitting the ~12x
        # HBM-gather penalty (same effect as dcn_fused's frame chunking).
        warped = []
        for i in range(t):
            if i == center:
                warped.append(ref)
            else:
                flow = spynet(ref, xn[:, i])
                warped.append(flow_warp(xn[:, i], flow))
        stacked = jnp.stack(warped, axis=1)  # (B, T, H, W, 3)
        # frame-major channel flattening matches torch .view(B, T*C, H, W)
        fused = stacked.transpose(0, 2, 3, 1, 4).reshape(b, h, w, t * c)

        y = nn.relu(nn.Conv(64, (9, 9), padding=[(4, 4), (4, 4)], dtype=self.dtype,
                            name="conv_3x7_64_9x9")(fused))
        y = nn.relu(nn.Conv(64, (9, 9), padding=[(4, 4), (4, 4)], dtype=self.dtype,
                            name="conv_64_64_9x9")(y))
        y = nn.relu(nn.Conv(64, (1, 1), dtype=self.dtype, name="conv_64_64_1x1")(y))
        y = nn.Conv(3, (1, 1), dtype=self.dtype, name="conv_64_3_1x1")(y)
        out = y + ref
        return (out * std + mean).astype(jnp.float32)
