"""EDVR backbone: PCD alignment + TSA fusion + residual trunk (NHWC).

Reference: models/archs/EDVR_arch.py (SURVEY.md §2.1 [H]) — structure,
layer widths and activation placement reproduced; layout re-designed for
TPU: channels-last, frames folded into the batch for the shared feature
extractor (one big conv batch for the MXU), nn.scan trunks, and the DCN as
our gather-interpolate-matmul op (ops/dcn.py).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from dynavsr_tpu.models.arch_util import (
    ResTrunk,
    avg_pool_3x3_s2,
    interpolate_bilinear,
    kaiming_scaled,
    lrelu,
    max_pool_3x3_s2,
)
from dynavsr_tpu.ops.dcn import deform_conv2d
from dynavsr_tpu.ops.pixelshuffle import pixel_shuffle

__all__ = ["EDVR", "PCDAlign", "TSAFusion", "DCNSep", "PredeblurResNetPyramid"]

_conv_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def _conv(features, kernel=3, stride=1, name=None, dtype=None, init=_conv_init):
    pad = (kernel - 1) // 2
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=[(pad, pad), (pad, pad)], kernel_init=init,
                   dtype=dtype, name=name)


class DCNSep(nn.Module):
    """EDVR's DCN_sep (dcn/deform_conv.py [H]): offsets+mask come from a conv
    over a *separate* offset-feature input.

    conv_offset_mask emits 3*Gd*K channels; the first 2*Gd*K are the
    (dy, dx)-interleaved offsets (torch's chunk(3)+cat(o1,o2) is exactly a
    slice of the first two thirds), the last Gd*K the pre-sigmoid mask.
    conv_offset_mask is zero-initialized like ModulatedDeformConvPack [H].
    """

    nf: int
    deformable_groups: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, offset_fea: jax.Array) -> jax.Array:
        k = 9  # 3x3 kernel taps
        gd = self.deformable_groups
        om = nn.Conv(3 * gd * k, (3, 3), padding=[(1, 1), (1, 1)],
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros,
                     dtype=self.dtype, name="conv_offset_mask")(offset_fea)
        offset = om[..., : 2 * gd * k]
        mask = jax.nn.sigmoid(om[..., 2 * gd * k :])
        # Reference DCN_sep warns when offset.abs().mean() > 100 — EDVR's
        # one training-instability detector [H]. Sown here; the train step
        # surfaces the max over all DCNs as the 'dcn_offset_absmean' metric
        # (no-op unless 'intermediates' is marked mutable).
        self.sow("intermediates", "offset_absmean",
                 jnp.mean(jnp.abs(offset.astype(jnp.float32))))
        weight = self.param(
            "weight", kaiming_scaled(1.0), (3, 3, self.nf, self.nf), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.nf,), jnp.float32)
        return deform_conv2d(
            x, offset, mask, weight.astype(x.dtype), bias.astype(x.dtype),
            stride=1, padding=1, dilation=1, groups=1, deformable_groups=gd,
        )


class PCDAlign(nn.Module):
    """Pyramid-Cascading-Deformable alignment (EDVR_arch.PCD_Align [H]).

    Aligns one neighbor frame's 3-level feature pyramid to the reference
    frame's. Offsets are predicted coarse->fine; upsampled offset features
    are scaled x2; aligned features cascade up; one extra cascading DCN at
    full resolution.
    """

    nf: int = 64
    groups: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, nbr_fea_l, ref_fea_l):
        dt = self.dtype
        # L3
        off = lrelu(_conv(self.nf, name="L3_offset_conv1", dtype=dt)(
            jnp.concatenate([nbr_fea_l[2], ref_fea_l[2]], axis=-1)))
        off = lrelu(_conv(self.nf, name="L3_offset_conv2", dtype=dt)(off))
        l3_fea = lrelu(DCNSep(self.nf, self.groups, dtype=dt, name="L3_dcnpack")(
            nbr_fea_l[2], off))
        # L2
        l3_off_up = interpolate_bilinear(off, 2) * 2.0
        off = lrelu(_conv(self.nf, name="L2_offset_conv1", dtype=dt)(
            jnp.concatenate([nbr_fea_l[1], ref_fea_l[1]], axis=-1)))
        off = lrelu(_conv(self.nf, name="L2_offset_conv2", dtype=dt)(
            jnp.concatenate([off, l3_off_up], axis=-1)))
        off = lrelu(_conv(self.nf, name="L2_offset_conv3", dtype=dt)(off))
        l2_fea = DCNSep(self.nf, self.groups, dtype=dt, name="L2_dcnpack")(
            nbr_fea_l[1], off)
        l3_fea_up = interpolate_bilinear(l3_fea, 2)
        l2_fea = lrelu(_conv(self.nf, name="L2_fea_conv", dtype=dt)(
            jnp.concatenate([l2_fea, l3_fea_up], axis=-1)))
        # L1
        l2_off_up = interpolate_bilinear(off, 2) * 2.0
        off = lrelu(_conv(self.nf, name="L1_offset_conv1", dtype=dt)(
            jnp.concatenate([nbr_fea_l[0], ref_fea_l[0]], axis=-1)))
        off = lrelu(_conv(self.nf, name="L1_offset_conv2", dtype=dt)(
            jnp.concatenate([off, l2_off_up], axis=-1)))
        off = lrelu(_conv(self.nf, name="L1_offset_conv3", dtype=dt)(off))
        l1_fea = DCNSep(self.nf, self.groups, dtype=dt, name="L1_dcnpack")(
            nbr_fea_l[0], off)
        l2_fea_up = interpolate_bilinear(l2_fea, 2)
        l1_fea = _conv(self.nf, name="L1_fea_conv", dtype=dt)(
            jnp.concatenate([l1_fea, l2_fea_up], axis=-1))
        # Cascading refinement
        off = lrelu(_conv(self.nf, name="cas_offset_conv1", dtype=dt)(
            jnp.concatenate([l1_fea, ref_fea_l[0]], axis=-1)))
        off = lrelu(_conv(self.nf, name="cas_offset_conv2", dtype=dt)(off))
        l1_fea = lrelu(DCNSep(self.nf, self.groups, dtype=dt, name="cas_dcnpack")(
            l1_fea, off))
        return l1_fea


class TSAFusion(nn.Module):
    """Temporal-Spatial Attention fusion (EDVR_arch.TSA_Fusion [H]).

    aligned_fea: (B, N, H, W, C) -> (B, H, W, C).
    """

    nf: int = 64
    nframes: int = 5
    center: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, aligned_fea: jax.Array) -> jax.Array:
        dt = self.dtype
        b, n, h, w, c = aligned_fea.shape
        # ---- temporal attention
        emb_ref = _conv(self.nf, name="tAtt_2", dtype=dt)(aligned_fea[:, self.center])
        emb = _conv(self.nf, name="tAtt_1", dtype=dt)(
            aligned_fea.reshape(b * n, h, w, c)).reshape(b, n, h, w, -1)
        cor = jnp.sum(emb * emb_ref[:, None], axis=-1)  # (B, N, H, W)
        cor_prob = jax.nn.sigmoid(cor)[..., None]  # (B, N, H, W, 1)
        fea = aligned_fea * cor_prob
        # channel order matters for fea_fusion parity: torch views (N*C) with
        # frame-major ordering; moveaxis keeps (..., N, C) -> flatten matches.
        fea_cat = fea.transpose(0, 2, 3, 1, 4).reshape(b, h, w, n * c)
        fused = lrelu(_conv(self.nf, kernel=1, name="fea_fusion", dtype=dt)(fea_cat))

        # ---- spatial attention pyramid
        att = lrelu(_conv(self.nf, kernel=1, name="sAtt_1", dtype=dt)(
            aligned_fea.transpose(0, 2, 3, 1, 4).reshape(b, h, w, n * c)))
        att_max = max_pool_3x3_s2(att)
        att_avg = avg_pool_3x3_s2(att)
        att = lrelu(_conv(self.nf, name="sAtt_2", dtype=dt)(
            jnp.concatenate([att_max, att_avg], axis=-1)))
        att_l = lrelu(_conv(self.nf, name="sAtt_L1", dtype=dt)(att))
        att_max = max_pool_3x3_s2(att_l)
        att_avg = avg_pool_3x3_s2(att_l)
        att_l = lrelu(_conv(self.nf, name="sAtt_L2", dtype=dt)(
            jnp.concatenate([att_max, att_avg], axis=-1)))
        att_l = lrelu(_conv(self.nf, name="sAtt_L3", dtype=dt)(att_l))
        att_l = interpolate_bilinear(att_l, 2)
        att = lrelu(_conv(self.nf, name="sAtt_3", dtype=dt)(att))
        att = att + att_l
        att = lrelu(_conv(self.nf, kernel=1, name="sAtt_4", dtype=dt)(att))
        att = interpolate_bilinear(att, 2)
        att = _conv(self.nf, name="sAtt_5", dtype=dt)(att)
        att_add = _conv(self.nf, kernel=1, name="sAtt_add_2", dtype=dt)(
            lrelu(_conv(self.nf, kernel=1, name="sAtt_add_1", dtype=dt)(att)))
        att = jax.nn.sigmoid(att)
        return fused * att * 2.0 + att_add


class PredeblurResNetPyramid(nn.Module):
    """Pre-deblur module (EDVR_arch.Predeblur_ResNet_Pyramid [H], detail [M]):
    pyramid of residual blocks on HR input, fused back to L1 resolution."""

    nf: int = 64
    hr_in: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from dynavsr_tpu.models.arch_util import ResidualBlockNoBN

        dt = self.dtype
        if self.hr_in:
            fea = lrelu(_conv(self.nf, name="conv_first_1", dtype=dt)(x))
            fea = lrelu(_conv(self.nf, stride=2, name="conv_first_2", dtype=dt)(fea))
            fea = lrelu(_conv(self.nf, stride=2, name="conv_first_3", dtype=dt)(fea))
        else:
            fea = lrelu(_conv(self.nf, name="conv_first", dtype=dt)(x))
        l1 = fea
        l2 = lrelu(_conv(self.nf, stride=2, name="deblur_L2_conv", dtype=dt)(l1))
        l3 = lrelu(_conv(self.nf, stride=2, name="deblur_L3_conv", dtype=dt)(l2))
        l3 = interpolate_bilinear(
            ResidualBlockNoBN(self.nf, dtype=dt, name="RB_L3_1")(l3), 2)
        l2 = ResidualBlockNoBN(self.nf, dtype=dt, name="RB_L2_1")(l2) + l3
        l2 = interpolate_bilinear(
            ResidualBlockNoBN(self.nf, dtype=dt, name="RB_L2_2")(l2), 2)
        out = ResidualBlockNoBN(self.nf, dtype=dt, name="RB_L1_1")(l1)
        out = ResidualBlockNoBN(self.nf, dtype=dt, name="RB_L1_2")(out) + l2
        for i in (3, 4, 5):
            out = ResidualBlockNoBN(self.nf, dtype=dt, name=f"RB_L1_{i}")(out)
        return out


class EDVR(nn.Module):
    """The EDVR network (EDVR_arch.EDVR [H]).

    Input x: (B, N, H, W, 3) LR frames in [0, 1] (NHWC, frames axis 1).
    Output: (B, 4H, 4W, 3) SR center frame (x4 fixed, like the reference).
    EDVR-M: nf=64, back_RBs=10. EDVR-L: nf=128, back_RBs=40.

    Structured as setup() + three public methods so serving can split the
    forward at the pyramid boundary:

    * ``__call__(x)`` — the reference forward, window in / SR center out.
    * ``extract_pyramid(frames)`` / ``fuse_pyramid(...)`` — the two exact
      halves of ``__call__`` (feature extraction is strictly per-frame; the
      first cross-frame op is PCD).
    * ``forward_seq(frames, win_idx)`` — sequence-mode inference: pyramids
      for the T clip frames are computed ONCE and shared by every sliding
      window that contains the frame. The reference recomputes per-frame
      features once per window (~N=5x redundancy on interior frames); this
      is exact, not an approximation — same math, deduplicated.
    """

    nf: int = 64
    nframes: int = 5
    groups: int = 8
    front_RBs: int = 5
    back_RBs: int = 10
    center: Optional[int] = None
    predeblur: bool = False
    hr_in: bool = False
    w_TSA: bool = True
    dtype: Any = None

    def setup(self):
        dt = self.dtype
        if self.predeblur:
            self.pre_deblur = PredeblurResNetPyramid(
                self.nf, self.hr_in, dtype=dt, name="pre_deblur")
            self.conv_1x1 = _conv(self.nf, kernel=1, name="conv_1x1", dtype=dt)
        elif self.hr_in:
            self.conv_first_1 = _conv(self.nf, name="conv_first_1", dtype=dt)
            self.conv_first_2 = _conv(self.nf, stride=2, name="conv_first_2", dtype=dt)
            self.conv_first_3 = _conv(self.nf, stride=2, name="conv_first_3", dtype=dt)
        else:
            self.conv_first = _conv(self.nf, name="conv_first", dtype=dt)
        self.feature_extraction = ResTrunk(
            self.nf, self.front_RBs, dtype=dt, name="feature_extraction")
        self.fea_L2_conv1 = _conv(self.nf, stride=2, name="fea_L2_conv1", dtype=dt)
        self.fea_L2_conv2 = _conv(self.nf, name="fea_L2_conv2", dtype=dt)
        self.fea_L3_conv1 = _conv(self.nf, stride=2, name="fea_L3_conv1", dtype=dt)
        self.fea_L3_conv2 = _conv(self.nf, name="fea_L3_conv2", dtype=dt)
        self.pcd_align = PCDAlign(self.nf, self.groups, dtype=dt, name="pcd_align")
        if self.w_TSA:
            self.tsa_fusion = TSAFusion(
                self.nf, self.nframes,
                self.nframes // 2 if self.center is None else self.center,
                dtype=dt, name="tsa_fusion")
        else:
            self.tsa_fusion = _conv(self.nf, kernel=1, name="tsa_fusion", dtype=dt)
        self.recon_trunk = ResTrunk(self.nf, self.back_RBs, dtype=dt, name="recon_trunk")
        # upconv1: nf -> nf*4 (PS2 -> nf); upconv2: nf -> 64*4 (PS2 -> 64) [H]
        self.upconv1 = _conv(self.nf * 4, name="upconv1", dtype=dt)
        self.upconv2 = _conv(64 * 4, name="upconv2", dtype=dt)
        self.HRconv = _conv(64, name="HRconv", dtype=dt)
        self.conv_last = _conv(3, name="conv_last", dtype=dt)

    def extract_pyramid(self, frames: jax.Array):
        """Per-frame 3-level feature pyramid. frames: (B, H, W, 3) with
        frames folded into the batch -> (l1, l2, l3) at (B, h, w, nf),
        (B, h/2, w/2, nf), (B, h/4, w/4, nf) where h = H (or H/4 for
        hr_in/predeblur-HR inputs). No cross-frame dependency — safe to
        compute once per clip frame and share across windows."""
        if self.predeblur:
            l1 = self.conv_1x1(self.pre_deblur(frames))
        elif self.hr_in:
            l1 = lrelu(self.conv_first_1(frames))
            l1 = lrelu(self.conv_first_2(l1))
            l1 = lrelu(self.conv_first_3(l1))
        else:
            l1 = lrelu(self.conv_first(frames))
        l1 = self.feature_extraction(l1)
        l2 = lrelu(self.fea_L2_conv1(l1))
        l2 = lrelu(self.fea_L2_conv2(l2))
        l3 = lrelu(self.fea_L3_conv1(l2))
        l3 = lrelu(self.fea_L3_conv2(l3))
        return l1, l2, l3

    def fuse_pyramid(self, l1: jax.Array, l2: jax.Array, l3: jax.Array,
                     x_center: jax.Array) -> jax.Array:
        """PCD align + TSA fuse + reconstruct from per-window pyramids.
        l1/l2/l3: (B, N, h[, /2, /4], w, nf); x_center: (B, H, W, 3) raw
        center frames (LR, or HR when hr_in)."""
        b, n, h, w, _ = l1.shape
        center = self.center if self.center is not None else n // 2
        ref_fea_l = [l1[:, center], l2[:, center], l3[:, center]]

        # TPU-first: fold the N neighbors into the batch and run PCD once
        # (the reference loops N times over the same module [H]; batching
        # keeps the MXU fed and compiles the module once). B-MAJOR fold:
        # plain reshapes, no transposes — profiling showed the n-major
        # transpose/tile pair cost ~90 ms per batch-4 forward in layout
        # copies of the 65 MB L1 feature map.
        nbr_l = [f.reshape(b * n, *f.shape[2:]) for f in (l1, l2, l3)]
        ref_l = [jnp.repeat(f, n, axis=0) for f in ref_fea_l]
        aligned = self.pcd_align(nbr_l, ref_l)  # (B*N, H, W, C), b-major
        aligned_fea = aligned.reshape(b, n, h, w, -1)

        if self.w_TSA:
            fea = self.tsa_fusion(aligned_fea)
        else:
            fea_cat = aligned_fea.transpose(0, 2, 3, 1, 4).reshape(b, h, w, -1)
            fea = self.tsa_fusion(fea_cat)

        out = self.recon_trunk(fea)
        out = lrelu(pixel_shuffle(self.upconv1(out), 2))
        out = lrelu(pixel_shuffle(self.upconv2(out), 2))
        out = lrelu(self.HRconv(out))
        out = self.conv_last(out)

        if self.hr_in:
            base = x_center
        else:
            base = interpolate_bilinear(x_center, 4)
        return (out + base).astype(jnp.float32)

    def __call__(self, x: jax.Array) -> jax.Array:
        b, n, h, w, _ = x.shape
        center = self.center if self.center is not None else n // 2
        l1, l2, l3 = self.extract_pyramid(x.reshape(b * n, h, w, -1))
        hh, ww = l1.shape[1:3]  # = h, w except hr_in (H/4)
        l1 = l1.reshape(b, n, hh, ww, -1)
        l2 = l2.reshape(b, n, hh // 2, ww // 2, -1)
        l3 = l3.reshape(b, n, hh // 4, ww // 4, -1)
        return self.fuse_pyramid(l1, l2, l3, x[:, center])

    def forward_seq(self, frames: jax.Array, win_idx: jax.Array) -> jax.Array:
        """Sequence-mode inference over one clip (beyond-reference serving
        path; exact — tests/test_seq_infer.py pins it against __call__).

        frames: (T, H, W, 3) clip; win_idx: (F, N) int32 window indices
        (data/windows.all_windows). Returns (F, 4H, 4W, 3)* SR frames.
        Each frame's pyramid is computed once (T extractions) instead of
        once per containing window (F*N extractions) — interior frames of
        a sliding-window clip are recomputed ~N times by the reference
        loop and by __call__-over-stacked-windows alike.

        Memory note: gathers (F, N) pyramids before PCD — chunk win_idx at
        the call site (adapt.chunked_apply) exactly like batched __call__
        windows. (*HR frames in, same-size out, when hr_in.)"""
        l1, l2, l3 = self.extract_pyramid(frames)
        n = win_idx.shape[1]
        center = self.center if self.center is not None else n // 2
        return self.fuse_pyramid(
            l1[win_idx], l2[win_idx], l3[win_idx], frames[win_idx[:, center]])
