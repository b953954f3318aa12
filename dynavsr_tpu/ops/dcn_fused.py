"""Memory-lean fused deformable conv — the production TPU path.

Replaces the reference CUDA kernel chain (im2col bilinear-gather kernel +
GEMM, models/archs/dcn/src/deform_conv_cuda_kernel.cu — SURVEY.md §2.2 [H])
with a formulation shaped by measured v5e behavior:

  * TPU vector-addressed loads are ROW-COUNT bound (~1.5-2.8 ns per
    gathered row almost regardless of row width) and collapse ~12x when
    the source spills from VMEM to HBM. The kernel therefore
    (a) scans over frame CHUNKS sized so each gather source stays
        VMEM-resident (~6 MB budget; large frames -> 1 frame/step, small
        SLR frames -> many, amortizing scan overhead),
    (b) packs the two VERTICAL bilinear corners into one row — source is
        concat(x_pad, roll(x_pad, -row_stride)) so row p carries both
        (y0, x) and (y0+1, x); for grouped DCN all FOUR corners pack into
        one 4*cg-lane row,
    (c) zero-pads each frame by a 2-pixel ring and clamps corner coords
        into the ring — exact CUDA zero-outside semantics with NO
        per-corner masks (the ring also makes cross-frame rolls safe), and
    (d) reduces the bilinear corners ON THE MXU: the gathered block is
        scaled by a full-lane corner-weight x mask field and contracted
        against a corner-expanded weight matrix (a VPU combine on
        cg=8-minor arrays costs more than the gather itself).
  * Each chunk's step is wrapped in jax.checkpoint: backward re-gathers
    chunk-by-chunk instead of saving im2col columns. Peak memory
    O(chunk*HW*K*C) — the unfused formulation OOMs at 38 GB on a 16 GB
    chip at Vid4 shapes.
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

__all__ = ["deform_conv2d_fused", "deform_conv2d_pipelined", "set_frame_chunk_budget"]

# Frame-chunking budget for the scan (bytes of packed source per step).
# Small SLR-scale frames pay ~0.2 ms of per-scan-step overhead, so packing
# 2 frames per step helps (adapt segment 0.711 -> 0.691 s, headline
# 8.91 -> 9.04 fps). The budget must stay SMALL: an 8 MB source spills the
# gather out of VMEM and regressed the same segment to 1.23 s even with
# the gathered block saved (round-2 measurements) — and round-1's 6 MB
# experiment failed for the same reason. L1/training-scale frames exceed
# the budget and keep fc=1 (their per-frame source is already the right
# unit). set_frame_chunk_budget(0) restores strict per-frame scanning.
_VMEM_SRC_BUDGET = 2 << 20


def set_frame_chunk_budget(nbytes: int) -> None:
    global _VMEM_SRC_BUDGET
    _VMEM_SRC_BUDGET = int(nbytes)


def _out_size(size: int, k: int, stride: int, pad: int, dil: int) -> int:
    return (size + 2 * pad - dil * (k - 1) - 1) // stride + 1


def _name_gather(v: jax.Array) -> jax.Array:
    """Tag the gathered corner block for the save-gather remat policy."""
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(v, "dcn_gather_v")


# Save-gather threshold (bytes of gathered block per scan step). The row
# gather is the kernel's bottleneck (~1.84 ns/row measured in-kernel,
# vector-load issue-bound); with full remat the backward re-gathers every
# step. When the per-step block is modest we save it instead — measured
# 10% off the 5-step adaptation segment (~7 MB SLR blocks) and ~3% off the
# EDVR-M supervised step (19 MB blocks at 64x64 LQ, batch 8 fits a 16 GB
# chip). EDVR-L training blocks (38 MB) and anything larger keep the fully
# rematerialized backward (memory).
_SAVE_GATHER_MAX_BYTES = 24 << 20


def _pick_chunk(b: int, src_bytes_per_frame: int) -> int:
    if _VMEM_SRC_BUDGET <= 0:
        return 1
    fc = max(1, min(b, _VMEM_SRC_BUDGET // max(1, src_bytes_per_frame)))
    while b % fc:
        fc -= 1
    return fc


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
    # 2-pixel zero-pad ring (see module docstring).
    hp, wp = h + 4, w + 4

    pack_lanes = (4 * cg) if gd > 1 else (2 * cin)
    src_bytes = hp * wp * gd * pack_lanes * x.dtype.itemsize
    fc = _pick_chunk(b, src_bytes)
    nchunk = b // fc
    frame_rows = hp * wp * gd  # packed rows per frame

    # Base sampling position (top-left tap) per output pixel, fp32.
    #
    # LAYOUT RULE (round-2 profile-driven): every per-sample tensor is kept
    # 2-D as (rows=pixels, lanes=J=gd*K). Shapes like (px, gd, K[, 1]) get
    # minor dims of 9/2/1, which TPU tiling pads to 128 lanes — the round-1
    # kernel spent ~25% of its time in reshape/copy/broadcast churn on such
    # tensors (measured: 6.65 -> 4.8 ms per L1 frame after this rewrite).
    oy = (jnp.arange(ho, dtype=jnp.float32) * stride - padding)[:, None]
    ox = (jnp.arange(wo, dtype=jnp.float32) * stride - padding)[None, :]
    base_y = jnp.broadcast_to(oy, (ho, wo)).reshape(hw)
    base_x = jnp.broadcast_to(ox, (ho, wo)).reshape(hw)
    ty = (jnp.arange(kh, dtype=jnp.float32) * dilation).repeat(kw)  # (K,)
    tx = jnp.tile(jnp.arange(kw, dtype=jnp.float32) * dilation, kh)
    # Flatten (frame-in-chunk, pixel) into ONE axis so fc=1 compiles to the
    # exact single-frame program (a leading singleton axis measurably hurt
    # XLA's schedule); the frame offset rides the row ids.
    nf = fc * hw
    base_y = jnp.tile(base_y, fc)
    base_x = jnp.tile(base_x, fc)
    f_rows = jnp.repeat(
        jnp.arange(fc, dtype=jnp.int32) * frame_rows, hw
    )[:, None]  # (nf, 1)
    jd = gd * k  # lane count of the 2-D (pixel, J) position/weight tensors
    ty_j = jnp.tile(ty, gd)[None, :]  # (1, J): col j = g*K + t
    tx_j = jnp.tile(tx, gd)[None, :]
    g_j = jnp.repeat(jnp.arange(gd, dtype=jnp.int32), k)[None, :]

    offs2 = offset.astype(jnp.float32).reshape(nchunk, nf, 2 * jd)
    masks2 = None if mask is None else mask.reshape(nchunk, nf, jd)
    xs_frames = x.reshape(nchunk, fc, h * w, cin)

    compute_dtype = x.dtype
    w4_mat = w2_mat = None
    if gd > 1 and groups == 1:
        # Per-(group, tap) weight (J, cg, cout): FOUR per-corner lane-slice
        # dots perform the corner reduction on the MXU, with each corner's
        # scalar field multiplying as a fused (J, NF, 1) broadcast — same
        # rationale as the gd=1 path (the single corner-expanded dot needed
        # a materialized concat-of-broadcast weight field; measured 7%
        # slower at L1 scale).
        w4_mat = weight.reshape(k, gd, cg, cout).transpose(1, 0, 2, 3) \
            .reshape(jd, cg, cout).astype(compute_dtype)
    elif gd == 1 and groups == 1:
        # Per-tap weight (K, Cin, Cout): each gathered row holds
        # [x(y0,.), x(y1,.)]; FOUR half-lane multi-contraction dots (one per
        # bilinear corner) reduce the corners on the MXU. Four dots beat two
        # y-pair-expanded dots because each corner's scalar field multiplies
        # as a fused (K, NF, 1) broadcast — the concat-of-broadcast field
        # tensors the pair form needs were materialized by XLA (measured
        # 0.62 ms/frame at L1, more than the gathers).
        w2_mat = weight.reshape(k, cin, cout).astype(compute_dtype)

    row_stride = wp * gd  # rows between (y, x) and (y+1, x) in packed layout

    def chunk_body(carry, xs):
        if masks2 is not None:
            xf, of2, mf2 = xs
        else:
            xf, of2 = xs
            mf2 = None
        # Packed, padded source for the whole chunk: frame index folds into
        # the row id (each frame's 2px zero ring makes cross-frame rolls
        # contribute zeros, so one roll covers every frame).
        xpad = jnp.pad(
            xf.reshape(fc, h, w, gd, cg),
            ((0, 0), (2, 2), (2, 2), (0, 0), (0, 0)),
        ).reshape(fc * hp * wp * gd, cg)
        if gd == 1:
            src = jnp.concatenate(
                [xpad, jnp.roll(xpad, -row_stride, axis=0)], axis=-1)
        else:
            src = jnp.concatenate(
                [xpad,
                 jnp.roll(xpad, -gd, axis=0),
                 jnp.roll(xpad, -row_stride, axis=0),
                 jnp.roll(xpad, -(row_stride + gd), axis=0)], axis=-1)

        # positions, all 2-D (NF = fc*HW, J); +2 shift into the padded frame.
        dy = of2[:, 0::2]
        dx = of2[:, 1::2]
        ys = base_y[:, None] + ty_j + dy
        xq = base_x[:, None] + tx_j + dx
        y0 = jnp.floor(ys)
        x0 = jnp.floor(xq)
        wy1 = (ys - y0).astype(compute_dtype)
        wx1 = (xq - x0).astype(compute_dtype)
        wy0 = 1.0 - wy1
        wx0 = 1.0 - wx1
        # Clamp into [-2, size+1]: every truly-outside corner (and its +1
        # neighbor, unless truly inside) lands in the zero ring.
        y0i = jnp.clip(y0.astype(jnp.int32), -2, h + 1)
        x0i = jnp.clip(x0.astype(jnp.int32), -2, w + 1)
        p = ((y0i + 2) * wp + (x0i + 2)) * gd + g_j + f_rows  # (NF, J)
        n = nf

        if gd > 1 and groups == 1:
            # j-major gather: rows ordered (j, pixel) so the gathered block
            # reshapes FREE to (J, NF, 4*cg) and the dots contract (J, cg)
            # without the (NF*J, 32) -> (NF, J*32) lane repack the n-major
            # order forces (measured 0.95 ms/frame at L1 scale).
            pf = p.T.reshape(-1)
            v = _name_gather(
                jnp.take(src, pf, axis=0, mode="clip").reshape(jd, n, 4 * cg))
            wt0, wt1 = wy0.T, wy1.T  # (J, NF)
            xt0, xt1 = wx0.T, wx1.T
            if mf2 is not None:
                mt = mf2.astype(compute_dtype).T
                wt0 = wt0 * mt
                wt1 = wt1 * mt
            dn = (((0, 2), (0, 1)), ((), ()))
            contrib = (
                jax.lax.dot_general(
                    v[..., :cg] * (wt0 * xt0)[..., None], w4_mat,
                    dimension_numbers=dn, preferred_element_type=jnp.float32)
                + jax.lax.dot_general(
                    v[..., cg : 2 * cg] * (wt0 * xt1)[..., None], w4_mat,
                    dimension_numbers=dn, preferred_element_type=jnp.float32)
                + jax.lax.dot_general(
                    v[..., 2 * cg : 3 * cg] * (wt1 * xt0)[..., None], w4_mat,
                    dimension_numbers=dn, preferred_element_type=jnp.float32)
                + jax.lax.dot_general(
                    v[..., 3 * cg :] * (wt1 * xt1)[..., None], w4_mat,
                    dimension_numbers=dn, preferred_element_type=jnp.float32)
            )
            return carry, contrib

        if gd == 1 and groups == 1:
            pf = p.T.reshape(-1)  # k-major, same free-reshape trick
            v_l = _name_gather(
                jnp.take(src, pf, axis=0, mode="clip").reshape(k, n, 2 * cin))
            v_r = _name_gather(
                jnp.take(src, pf + gd, axis=0, mode="clip").reshape(k, n, 2 * cin))
            wt0, wt1 = wy0.T, wy1.T  # (K, NF)
            if mf2 is not None:
                mt = mf2.astype(compute_dtype).T
                wt0 = wt0 * mt
                wt1 = wt1 * mt
            xt0, xt1 = wx0.T, wx1.T
            dn = (((0, 2), (0, 1)), ((), ()))
            contrib = (
                jax.lax.dot_general(
                    v_l[..., :cin] * (wt0 * xt0)[..., None], w2_mat,
                    dimension_numbers=dn, preferred_element_type=jnp.float32)
                + jax.lax.dot_general(
                    v_l[..., cin:] * (wt1 * xt0)[..., None], w2_mat,
                    dimension_numbers=dn, preferred_element_type=jnp.float32)
                + jax.lax.dot_general(
                    v_r[..., :cin] * (wt0 * xt1)[..., None], w2_mat,
                    dimension_numbers=dn, preferred_element_type=jnp.float32)
                + jax.lax.dot_general(
                    v_r[..., cin:] * (wt1 * xt1)[..., None], w2_mat,
                    dimension_numbers=dn, preferred_element_type=jnp.float32)
            )
            return carry, contrib

        # General path (conv groups > 1): VPU corner combine + grouped
        # einsum. Rarely hot (EDVR uses groups=1); keeps the reference
        # (NF, Gd, K, .) shapes.
        pg = p.reshape(-1)
        wy0g = wy0.reshape(n, gd, k, 1)
        wy1g = wy1.reshape(n, gd, k, 1)
        wx0g = wx0.reshape(n, gd, k, 1)
        wx1g = wx1.reshape(n, gd, k, 1)
        if gd > 1:
            v = jnp.take(src, pg, axis=0, mode="clip").reshape(n, gd, k, 4 * cg)
            cols = (
                wy0g * (wx0g * v[..., :cg] + wx1g * v[..., cg : 2 * cg])
                + wy1g * (wx0g * v[..., 2 * cg : 3 * cg] + wx1g * v[..., 3 * cg :])
            )
        else:
            v_l = jnp.take(src, pg, axis=0, mode="clip").reshape(n, gd, k, 2 * cg)
            v_r = jnp.take(src, pg + gd, axis=0, mode="clip").reshape(n, gd, k, 2 * cg)
            left = wy0g * v_l[..., :cg] + wy1g * v_l[..., cg:]
            right = wy0g * v_r[..., :cg] + wy1g * v_r[..., cg:]
            cols = wx0g * left + wx1g * right
        if mf2 is not None:
            cols = cols * mf2.reshape(n, gd, k, 1).astype(compute_dtype)
        cols = cols.transpose(0, 2, 1, 3).reshape(n, k, groups, cin_g)
        w_g = weight.reshape(k, cin_g, groups, cout // groups).astype(compute_dtype)
        contrib = jnp.einsum(
            "pkgc,kcgo->pgo", cols, w_g, preferred_element_type=jnp.float32
        ).reshape(n, cout)
        return carry, contrib

    xs = (xs_frames, offs2, masks2) if masks2 is not None else (xs_frames, offs2)
    v_bytes = nf * (gd * k * 4 * cg if gd > 1 else 2 * k * 2 * cin) * x.dtype.itemsize
    if groups == 1 and v_bytes <= _SAVE_GATHER_MAX_BYTES:
        from jax.ad_checkpoint import checkpoint_policies

        body = jax.checkpoint(
            chunk_body,
            policy=checkpoint_policies.save_only_these_names("dcn_gather_v"),
        )
    else:
        body = jax.checkpoint(chunk_body)
    _, out = jax.lax.scan(body, 0.0, xs)

    out = out.reshape(b, ho, wo, cout).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out


def deform_conv2d_pipelined(
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
    """Software-pipelined serving variant of deform_conv2d_fused.

    STATUS (round 2): superseded for every measured workload — the default
    kernel's save-gather remat policy captures the backward re-gather win
    without the carried block's HBM round-trip, and the j-major layout
    rewrite was applied only to the default path. Kept selectable (with
    full parity tests) as the documented record of the scheduling
    experiment; see ROOFLINE.md.

    Identical numerics and layout contract; different schedule:
      * The per-frame scan carries the GATHERED corner block of frame i and
        consumes it (weight-field multiply + MXU contraction) while gathering
        frame i+1 — the row-gather (the measured bottleneck, ~2.8 ns/row,
        vector-load issue-bound) overlaps the VPU/MXU work instead of
        serializing with it.
      * No jax.checkpoint: the gathered blocks ride the scan carry, so a
        backward pass reuses them instead of re-gathering (saves one full
        gather per frame). Memory is O(frames x HW x Gd*K*4*cg) — fine at
        adaptation (SLR) and eval scales, NOT for big-batch supervised
        training; train paths keep deform_conv2d_fused (rematerialized).
    Use via ops.dcn.set_dcn_impl('pipelined') or impl='pipelined'.
    """
    b, h, w, cin = x.shape
    kh, kw, cin_g, cout = weight.shape
    k = kh * kw
    gd = deformable_groups
    cg = cin // gd
    if groups != 1:  # general path has no packed-MXU fold to pipeline
        return deform_conv2d_fused(x, offset, mask, weight, bias, stride,
                                   padding, dilation, groups, gd)
    ho = _out_size(h, kh, stride, padding, dilation)
    wo = _out_size(w, kw, stride, padding, dilation)
    hw = ho * wo
    hp, wp = h + 4, w + 4

    oy = (jnp.arange(ho, dtype=jnp.float32) * stride - padding)[:, None]
    ox = (jnp.arange(wo, dtype=jnp.float32) * stride - padding)[None, :]
    base_y = jnp.broadcast_to(oy, (ho, wo)).reshape(hw)
    base_x = jnp.broadcast_to(ox, (ho, wo)).reshape(hw)
    ty = (jnp.arange(kh, dtype=jnp.float32) * dilation).repeat(kw)
    tx = jnp.tile(jnp.arange(kw, dtype=jnp.float32) * dilation, kh)

    compute_dtype = x.dtype
    if gd > 1:
        wk = weight.reshape(k, gd, cg, cout).transpose(1, 0, 2, 3)
        w_pipe = jnp.broadcast_to(
            wk[:, :, None, :, :], (gd, k, 4, cg, cout)
        ).reshape(gd * k * 4 * cg, cout).astype(compute_dtype)
    else:
        wk = weight.reshape(k, cin, cout)
        w_pipe = jnp.broadcast_to(
            wk[:, None, :, :], (k, 2, cin, cout)
        ).reshape(k * 2 * cin, cout).astype(compute_dtype)

    row_stride = wp * gd
    offs = offset.astype(jnp.float32).reshape(b, hw, gd, k, 2)
    masks = None if mask is None else mask.reshape(b, hw, gd, k)
    xf = x.reshape(b, h * w, cin)
    g_iota = jnp.arange(gd, dtype=jnp.int32)[None, :, None]

    def positions(of):
        """(hw, gd, k) packed row ids + fp corner weights for one frame."""
        ys = base_y[:, None, None] + ty[None, None, :] + of[..., 0]
        xq = base_x[:, None, None] + tx[None, None, :] + of[..., 1]
        y0 = jnp.floor(ys)
        x0 = jnp.floor(xq)
        wy1 = (ys - y0).astype(compute_dtype)[..., None]
        wx1 = (xq - x0).astype(compute_dtype)[..., None]
        y0i = jnp.clip(y0.astype(jnp.int32), -2, h + 1)
        x0i = jnp.clip(x0.astype(jnp.int32), -2, w + 1)
        p = ((y0i + 2) * wp + (x0i + 2)) * gd + g_iota
        return p.reshape(-1), wy1, wx1

    def gather_one(xfi, ofi):
        """Gather the packed corner block(s) of one frame."""
        xpad = jnp.pad(
            xfi.reshape(h, w, gd, cg), ((2, 2), (2, 2), (0, 0), (0, 0))
        ).reshape(hp * wp * gd, cg)
        p, _, _ = positions(ofi)
        if gd > 1:
            src = jnp.concatenate(
                [xpad,
                 jnp.roll(xpad, -gd, axis=0),
                 jnp.roll(xpad, -row_stride, axis=0),
                 jnp.roll(xpad, -(row_stride + gd), axis=0)], axis=-1)
            return (jnp.take(src, p, axis=0, mode="clip")
                    .reshape(hw, gd * k * 4 * cg),)
        src = jnp.concatenate([xpad, jnp.roll(xpad, -row_stride, axis=0)], axis=-1)
        v_l = jnp.take(src, p, axis=0, mode="clip").reshape(hw, k * 2 * cin)
        v_r = jnp.take(src, p + gd, axis=0, mode="clip").reshape(hw, k * 2 * cin)
        return (v_l, v_r)

    def consume(block, ofi, mfi):
        """Weight-field multiply + MXU contraction of a gathered block."""
        _, wy1, wx1 = positions(ofi)
        wy0 = 1.0 - wy1
        wx0 = 1.0 - wx1
        if gd > 1:
            (v,) = block
            wcorn = jnp.stack(
                [wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1], axis=-1
            )[..., 0, :]
            if mfi is not None:
                wcorn = wcorn * mfi[..., None].astype(compute_dtype)
            wfield = jnp.broadcast_to(
                wcorn[..., None], (hw, gd, k, 4, cg)
            ).reshape(hw, gd * k * 4 * cg)
            return jax.lax.dot(v * wfield, w_pipe,
                               preferred_element_type=jnp.float32)
        v_l, v_r = block
        wy = jnp.concatenate([wy0, wy1], axis=-1)[:, 0]
        if mfi is not None:
            wy = wy * mfi[:, 0, :, None].astype(compute_dtype)
        wxl = (wy * wx0[:, 0]).reshape(hw, k, 2, 1)
        wxr = (wy * wx1[:, 0]).reshape(hw, k, 2, 1)
        fl = jnp.broadcast_to(wxl, (hw, k, 2, cin)).reshape(hw, k * 2 * cin)
        fr = jnp.broadcast_to(wxr, (hw, k, 2, cin)).reshape(hw, k * 2 * cin)
        return jax.lax.dot(v_l * fl, w_pipe, preferred_element_type=jnp.float32) \
            + jax.lax.dot(v_r * fr, w_pipe, preferred_element_type=jnp.float32)

    # Prologue: gather frame 0; each scan step consumes frame i while
    # gathering frame i+1 (the final step re-gathers frame 0 — one wasted
    # gather, kept so every step compiles to the same program).
    block0 = gather_one(xf[0], offs[0])
    xf_next = jnp.roll(xf, -1, axis=0)
    offs_next = jnp.roll(offs, -1, axis=0)

    def body(block, xs_i):
        if masks is not None:
            ofi, mfi, xfn, ofn = xs_i
        else:
            ofi, xfn, ofn = xs_i
            mfi = None
        contrib = consume(block, ofi, mfi)
        return gather_one(xfn, ofn), contrib

    xs = (offs, masks, xf_next, offs_next) if masks is not None \
        else (offs, xf_next, offs_next)
    _, out = jax.lax.scan(body, block0, xs)

    out = out.reshape(b, ho, wo, cout).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out
