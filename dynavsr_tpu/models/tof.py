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

from dynavsr_tpu.ops.conv_s2d import (
    ConvParams,
    conv_packed_1x1,
    conv_s2d_enter,
    conv_s2d_packed,
    depth_to_space,
)
from dynavsr_tpu.ops.grid_sample import flow_warp

__all__ = ["SpyNet", "SpyNetBlock", "TOFlow"]

_MEAN = (0.485, 0.456, 0.406)
_STD = (0.229, 0.224, 0.225)


def _avg_pool2(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


class SpyNetBlock(nn.Module):
    """One pyramid-level flow refiner: 5 convs 7x7 with BN+ReLU [H].

    The 7x7 convs (cout 32/64/32/16/2) are lane-starved on the MXU
    (conv-as-matmul output lanes = cout, so <=cout/128 of peak). With
    s2d=True the whole block runs in the phase-packed space-to-depth
    domain (ops/conv_s2d.py): enter once via the stride-2 conv, keep
    every intermediate conv packed->packed (4x the lanes, zero layout
    transposes — per-conv enter/exit round-trips measured 3x SLOWER than
    plain from XLA layout-conversion copies), exit with one cheap
    depth-to-space on the 8-channel output. BatchNorm runs on a free
    (..., 4, C) reshape VIEW of the packed tensor, which reproduces the
    original per-channel statistics exactly in BOTH eval and train mode
    (the 4 phases are just a re-tiling of the same pixel set).

    Param/variable pytree is identical to the plain path — checkpoints
    are interchangeable and torch-importable.
    """

    train: bool = False
    dtype: Any = None
    s2d: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        widths = (32, 64, 32, 16, 2)
        chans = (x.shape[-1],) + widths[:-1]
        wbs = [ConvParams(f, (7, 7), name=f"conv{i}")(chans[i])
               for i, f in enumerate(widths)]
        bns = [nn.BatchNorm(use_running_average=not self.train, momentum=0.9,
                            epsilon=1e-5, name=f"bn{i}") for i in range(4)]
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        cast = lambda w, b: (w.astype(dtype),  # noqa: E731
                             None if b is None else b.astype(dtype))
        packed = self.s2d and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
        if packed:
            y = conv_s2d_enter(x, *cast(*wbs[0]))
            for i in (1, 2, 3, 4):
                f = widths[i - 1]
                y5 = bns[i - 1](y.reshape(y.shape[:-1] + (4, f)))
                y = nn.relu(y5.astype(dtype)).reshape(y.shape[:-1] + (4 * f,))
                y = conv_s2d_packed(y, *cast(*wbs[i]))
            return depth_to_space(y)
        y = x
        for i in range(5):
            w, b = cast(*wbs[i])
            y = jax.lax.conv_general_dilated(
                y, w, (1, 1), [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if b is not None:
                y = y + b
            if i < 4:
                y = nn.relu(bns[i](y).astype(dtype))
        return y


class SpyNet(nn.Module):
    """4-level coarse-to-fine flow estimator [H].

    ref, nbr: (B, H, W, 3) normalized frames. Returns flow (B, H, W, 2) as
    (dx, dy), the displacement that warps nbr onto ref.
    """

    levels: int = 4
    train: bool = False
    dtype: Any = None
    s2d: bool = True

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
            flow = flow + SpyNetBlock(self.train, self.dtype, self.s2d,
                                      name=f"block{lvl}")(inp)
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
    s2d: bool = True  # space-to-depth conv path for SpyNet + fusion convs

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

        spynet = SpyNet(train=self.train, dtype=self.dtype, s2d=self.s2d,
                        name="spynet")
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

        # Fusion tail. With s2d, the two 9x9 convs (cout=64, lane-starved)
        # and the 1x1s run in the packed domain end-to-end: enter at the
        # first 9x9, packed 9x9, per-phase grouped 1x1s, one depth-to-space
        # on the 12-channel output (same rationale as SpyNetBlock).
        dt = self.dtype or fused.dtype
        wb1 = ConvParams(64, (9, 9), name="conv_3x7_64_9x9")(t * c)
        wb2 = ConvParams(64, (9, 9), name="conv_64_64_9x9")(64)
        wb3 = ConvParams(64, (1, 1), name="conv_64_64_1x1")(64)
        wb4 = ConvParams(3, (1, 1), name="conv_64_3_1x1")(64)
        cast = lambda wb: (wb[0].astype(dt),  # noqa: E731
                           None if wb[1] is None else wb[1].astype(dt))
        fused = fused.astype(dt)
        if self.s2d and h % 2 == 0 and w % 2 == 0:
            yp = nn.relu(conv_s2d_enter(fused, *cast(wb1)))
            yp = nn.relu(conv_s2d_packed(yp, *cast(wb2)))
            yp = nn.relu(conv_packed_1x1(yp, *cast(wb3)))
            yp = conv_packed_1x1(yp, *cast(wb4))
            y = depth_to_space(yp)
        else:
            y = fused
            for i, wb in enumerate((wb1, wb2, wb3, wb4)):
                wk, bk = cast(wb)
                p = wk.shape[0] // 2
                y = jax.lax.conv_general_dilated(
                    y, wk, (1, 1), [(p, p), (p, p)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                if bk is not None:
                    y = y + bk
                if i < 3:
                    y = nn.relu(y)
        out = y + ref
        return (out * std + mean).astype(jnp.float32)
