"""Memory-lean fused deformable conv — the production TPU path.

Replaces the reference CUDA kernel chain (im2col bilinear-gather kernel +
GEMM, models/archs/dcn/src/deform_conv_cuda_kernel.cu — SURVEY.md §2.2 [H])
with a formulation shaped by measured v5e behavior:

  * TPU vector-addressed loads are ROW-COUNT bound (~1.5-2.8 ns per
    gathered row almost regardless of row width) and collapse ~12x when
    the source spills from VMEM to HBM. The kernel therefore
    (a) scans over frames so each gather source stays VMEM-resident,
    (b) packs the two VERTICAL bilinear corners into one row — source is
        concat(x_pad, roll(x_pad, -row_stride)) so row p carries both
        (y0, x) and (y0+1, x) — halving row count,
    (c) zero-pads the frame by a 2-pixel ring and clamps corner coords
        into the ring, which reproduces the CUDA kernel's zero-outside
        semantics with NO per-corner masks, and
    (d) performs one (HW, K*C) x (K*C, Cout) MXU matmul per frame.
    Measured: ~0.7 ms per 144x176x64 frame per DCN call (Gd=1) vs 94 ms
    for the naive global formulation.
  * Each frame's step is wrapped in jax.checkpoint: backward re-gathers
    frame-by-frame instead of saving im2col columns. Peak memory
    O(HW*K*C) per frame — the unfused formulation OOMs at 38 GB on a
    16 GB chip at Vid4 shapes.
  * Gradients flow through JAX autodiff: gather VJP -> scatter-add; offset
    grads match the analytic CUDA backward (dmcn_get_coordinate_weight)
    away from integer positions.

A hand-written Pallas kernel was evaluated and rejected: Mosaic's
tpu.dynamic_gather is a within-vreg permute ("Multiple source vregs along
gather dimension" unimplemented), and XLA's row gather already runs at the
hardware's vector-load rate. NOTE deformable_groups=G costs G x the samples
of G=1 (per-group positions need narrow rows): prefer Gd=1 in TPU-flagship
configs, keep Gd=8 for reference-checkpoint parity.

Layout contract (offset/mask channel order) is identical to
ops/dcn_ref.py, the parity oracle.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["deform_conv2d_fused"]


def _out_size(size: int, k: int, stride: int, pad: int, dil: int) -> int:
    return (size + 2 * pad - dil * (k - 1) - 1) // stride + 1


def deform_conv2d_fused(
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
    """Modulated (mask given) or plain deformable conv, CUDA-layout parity.

    x: (B, H, W, Cin) NHWC; offset: (B, Ho, Wo, 2*Gd*K) interleaved (dy, dx)
    per (group, tap); mask: (B, Ho, Wo, Gd*K) post-sigmoid or None;
    weight: HWIO (kh, kw, Cin//groups, Cout).
    """
    b, h, w, cin = x.shape
    kh, kw, cin_g, cout = weight.shape
    k = kh * kw
    gd = deformable_groups
    cg = cin // gd
    ho = _out_size(h, kh, stride, padding, dilation)
    wo = _out_size(w, kw, stride, padding, dilation)
    hw = ho * wo
    # 2-pixel zero-pad ring: clamping y0 into [-2, h+1] keeps the invariant
    # "a truly-outside corner lands on a zero row AND its +1 neighbor is
    # still zero unless the true neighbor is inside" (a 1-pixel ring breaks
    # it for corners more than 1px outside).
    hp, wp = h + 4, w + 4

    # Base sampling position (top-left tap) per output pixel, fp32.
    oy = (jnp.arange(ho, dtype=jnp.float32) * stride - padding)[:, None]
    ox = (jnp.arange(wo, dtype=jnp.float32) * stride - padding)[None, :]
    base_y = jnp.broadcast_to(oy, (ho, wo)).reshape(hw)
    base_x = jnp.broadcast_to(ox, (ho, wo)).reshape(hw)
    ty = (jnp.arange(kh, dtype=jnp.float32) * dilation).repeat(kw)  # (K,)
    tx = jnp.tile(jnp.arange(kw, dtype=jnp.float32) * dilation, kh)

    offs = offset.astype(jnp.float32).reshape(b, hw, gd, k, 2)
    masks = None if mask is None else mask.reshape(b, hw, gd, k)

    compute_dtype = x.dtype
    w_mat = weight.reshape(k * cin_g, cout).astype(compute_dtype)
    w4_mat = w2_mat = None
    if gd > 1 and groups == 1:
        # 4x corner-expanded weight: rows ordered (gd, k, corner, cg) to
        # match the gathered-value flatten order; the MXU contraction
        # performs the corner reduction.
        wk = weight.reshape(k, gd, cg, cout).transpose(1, 0, 2, 3)  # (gd,k,cg,o)
        w4_mat = jnp.broadcast_to(
            wk[:, :, None, :, :], (gd, k, 4, cg, cout)
        ).reshape(gd * k * 4 * cg, cout).astype(compute_dtype)
    elif gd == 1 and groups == 1:
        # y-pair-expanded weight (k, ycorner, C, o): each gathered row holds
        # [x(y0,.), x(y1,.)]; two partial matmuls (left/right x-corner)
        # reduce the corners on the MXU instead of the 8-lane VPU path.
        wk = weight.reshape(k, cin, cout)
        w2_mat = jnp.broadcast_to(
            wk[:, None, :, :], (k, 2, cin, cout)
        ).reshape(k * 2 * cin, cout).astype(compute_dtype)

    row_stride = wp * gd  # rows between (y, x) and (y+1, x) in packed layout

    def frame_body(carry, xs):
        if masks is not None:
            xf, of, mf = xs
        else:
            xf, of = xs
            mf = None
        # Packed, padded source. Gather rate is row-count bound, so pack as
        # many corners per row as the lane budget allows:
        #   gd == 1: rows of 2C = [x(y,x), x(y+1,x)]; 4C rows measured SLOWER
        #            (512B splits across vregs), so x-corners use a 2nd take.
        #   gd  > 1: rows are narrow (cg lanes) — pack ALL 4 corners
        #            [x(y,x), x(y,x+1), x(y+1,x), x(y+1,x+1)] in one take.
        xpad = jnp.pad(
            xf.reshape(h, w, gd, cg), ((2, 2), (2, 2), (0, 0), (0, 0))
        ).reshape(hp * wp * gd, cg)
        if gd == 1:
            src = jnp.concatenate(
                [xpad, jnp.roll(xpad, -row_stride, axis=0)], axis=-1)
        else:
            src = jnp.concatenate(
                [xpad,
                 jnp.roll(xpad, -gd, axis=0),
                 jnp.roll(xpad, -row_stride, axis=0),
                 jnp.roll(xpad, -(row_stride + gd), axis=0)], axis=-1)

        # positions: (HW, Gd, K); +1 shift into the padded frame.
        ys = base_y[:, None, None] + ty[None, None, :] + of[..., 0]
        xq = base_x[:, None, None] + tx[None, None, :] + of[..., 1]
        y0 = jnp.floor(ys)
        x0 = jnp.floor(xq)
        wy1 = (ys - y0).astype(compute_dtype)[..., None]
        wx1 = (xq - x0).astype(compute_dtype)[..., None]
        wy0 = 1.0 - wy1
        wx0 = 1.0 - wx1
        # Clamp into [-2, size+1]: every truly-outside corner (and its +1
        # neighbor, unless truly inside) lands in the zero ring, reproducing
        # zero-outside contributions without masks.
        y0i = jnp.clip(y0.astype(jnp.int32), -2, h + 1)
        x0i = jnp.clip(x0.astype(jnp.int32), -2, w + 1)
        g_iota = jnp.arange(gd, dtype=jnp.int32)[None, :, None]
        p = ((y0i + 2) * wp + (x0i + 2)) * gd + g_iota  # (HW, Gd, K)
        p = p.reshape(-1)

        if gd > 1 and groups == 1:
            # Folded path: do NOT reduce the 4 corners on the VPU — arrays
            # shaped (..., cg=8) use 8 of 128 lanes and the combine costs
            # more than the gather. Instead multiply by a full-lane
            # (HW, Gd*K*4*cg) weight field (corner weights x mask) and let
            # the MXU reduce corners via a 4x-expanded weight matrix.
            v = jnp.take(src, p, axis=0, mode="clip").reshape(hw, gd * k * 4 * cg)
            wcorn = jnp.stack(
                [wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1], axis=-1
            )  # (HW, Gd, K, 4) in compute dtype (wy*/wx* carry [..., None])
            wcorn = wcorn[..., 0, :] if wcorn.ndim == 5 else wcorn
            if mf is not None:
                wcorn = wcorn * mf[..., None].astype(compute_dtype)
            wfield = jnp.broadcast_to(
                wcorn[..., None], (hw, gd, k, 4, cg)
            ).reshape(hw, gd * k * 4 * cg)
            contrib = jax.lax.dot(
                v * wfield, w4_mat, preferred_element_type=jnp.float32
            )
            return carry, contrib

        if gd == 1 and groups == 1:
            # Folded path (see w2_mat): weight fields over (HW, K*2C) at
            # full lane utilization, corner reduction on the MXU.
            v_l = jnp.take(src, p, axis=0, mode="clip").reshape(hw, k * 2 * cin)
            v_r = jnp.take(src, p + gd, axis=0, mode="clip").reshape(hw, k * 2 * cin)
            wy = jnp.concatenate([wy0, wy1], axis=-1)[:, 0]  # (HW, K, 2)
            if mf is not None:
                wy = wy * mf[:, 0, :, None].astype(compute_dtype)
            wxl = (wy * wx0[:, 0]).reshape(hw, k, 2, 1)
            wxr = (wy * wx1[:, 0]).reshape(hw, k, 2, 1)
            fl = jnp.broadcast_to(wxl, (hw, k, 2, cin)).reshape(hw, k * 2 * cin)
            fr = jnp.broadcast_to(wxr, (hw, k, 2, cin)).reshape(hw, k * 2 * cin)
            contrib = jax.lax.dot(
                v_l * fl, w2_mat, preferred_element_type=jnp.float32
            ) + jax.lax.dot(
                v_r * fr, w2_mat, preferred_element_type=jnp.float32
            )
            return carry, contrib

        if gd == 1:
            v_l = jnp.take(src, p, axis=0, mode="clip").reshape(hw, gd, k, 2 * cg)
            v_r = jnp.take(src, p + gd, axis=0, mode="clip").reshape(hw, gd, k, 2 * cg)
            left = wy0 * v_l[..., :cg] + wy1 * v_l[..., cg:]
            right = wy0 * v_r[..., :cg] + wy1 * v_r[..., cg:]
            cols = wx0 * left + wx1 * right  # (HW, Gd, K, cg)
        else:
            v = jnp.take(src, p, axis=0, mode="clip").reshape(hw, gd, k, 4 * cg)
            cols = (
                wy0 * (wx0 * v[..., :cg] + wx1 * v[..., cg : 2 * cg])
                + wy1 * (wx0 * v[..., 2 * cg : 3 * cg] + wx1 * v[..., 3 * cg :])
            )
        if mf is not None:
            cols = cols * mf[..., None].astype(compute_dtype)
        # -> (HW, K, Gd*cg=Cin): im2col channel order within a tap is the
        # original Cin order (group-major).
        cols = cols.transpose(0, 2, 1, 3).reshape(hw, k * cin)

        if groups == 1:
            contrib = jax.lax.dot(cols, w_mat, preferred_element_type=jnp.float32)
        else:
            cols_g = cols.reshape(hw, k, groups, cin_g)
            w_g = weight.reshape(k, cin_g, groups, cout // groups).astype(compute_dtype)
            contrib = jnp.einsum(
                "pkgc,kcgo->pgo", cols_g, w_g, preferred_element_type=jnp.float32
            ).reshape(hw, cout)
        return carry, contrib

    xs_frames = x.reshape(b, h * w, cin)
    xs = (xs_frames, offs, masks) if masks is not None else (xs_frames, offs)
    _, out = jax.lax.scan(jax.checkpoint(frame_body), 0.0, xs)

    out = out.reshape(b, ho, wo, cout).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out
