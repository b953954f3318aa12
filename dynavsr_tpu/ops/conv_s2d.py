"""Space-to-depth reformulation of small-cout stride-1 convs for the MXU.

XLA lowers an NHWC conv to a matmul whose output lane dimension IS cout;
SpyNet-class convs (7x7, cout in {2, 16, 32, 64} — reference
models/archs/TOF_arch.py, SURVEY.md §2.1 [H]) therefore run the MXU at
~cout/128 of peak. Identity used here (pure XLA — no gathers, so none of
the HBM-gather penalties that killed the Pallas alternatives, ROOFLINE.md):

    stride-1 KxK conv  ==  stride-r (K+r-1)^2 conv with r^2*cout
                           phase-packed output channels + depth-to-space

    y[r*p+a, r*q+b, co] = conv(x, w)[r*p+a, r*q+b, co]
                        = conv_stride_r(x, W)[p, q, (a, b, co)]
    W[k, j, ci, (a,b,co)] = w[k-a, j-b, ci, co]   (zero outside 0..K-1)

FLOP inflation ((K+r-1)/K)^2 (1.31x for K=7, r=2) buys r^2 more output
lanes. COMPOSITION IS THE HARD PART (measured, TPU v5e, full TOFlow at
x4 serving shapes — tools/tof_serve_bench.py):

  - per-conv enter/exit round-trips: 3.2x SLOWER than plain convs (XLA
    materializes layout-conversion copies between the depth-to-space of
    one conv and the strided entry of the next);
  - stay-packed (enter once per conv chain, packed->packed middles via
    s2d_pack_kernel_packed, one exit): 546 -> 343 ms / 4 windows,
    **1.59x faster** end-to-end.

The win holds for cout <= 64 with K >= 7. Cost model: a packed->packed
middle conv for K=7 is 5x5 over 4cin->4cout = 2.04x the FLOPs (only
49/100 of the packed taps are nonzero) against 4x the output lanes, so
cout<=32 middles win ~2x, cout=64 middles are ~breakeven, and the
transpose-free composition is what makes the whole chain profitable.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = [
    "conv2d_s2d",
    "s2d_pack_kernel",
    "s2d_pack_kernel_packed",
    "conv_s2d_enter",
    "conv_s2d_packed",
    "conv_packed_1x1",
    "depth_to_space",
    "ConvS2D",
    # channel-major 3-D (NDHWC, T passthrough) variants — DUF's dense trunk
    "s2d_pack_kernel_3d_cm",
    "s2d_pack_kernel_packed_cm",
    "conv_s2d_enter_3d_cm",
    "conv_s2d_packed_3d_cm",
    "conv_packed_1x1_cm",
    "depth_to_space_cm",
]


def s2d_pack_kernel(w: jax.Array, r: int = 2) -> jax.Array:
    """Embed a stride-1 (K, K, cin, cout) HWIO kernel into the phase-packed
    stride-r ((K+r-1), (K+r-1), cin, r*r*cout) kernel.

    Channel order of the packed output is (a, b, co) — phase-major — which
    is exactly torch/our pixel_shuffle ordering, so depth-to-space with the
    standard unpack recovers y.
    """
    k, k2, _, _ = w.shape
    if k != k2 or k % 2 == 0:
        raise ValueError(f"square odd kernel required, got {w.shape}")
    phases = [
        jnp.pad(w, ((a, r - 1 - a), (b, r - 1 - b), (0, 0), (0, 0)))
        for a in range(r)
        for b in range(r)
    ]
    kk = k + r - 1
    return jnp.stack(phases, axis=3).reshape(kk, kk, w.shape[2], r * r * w.shape[3])


def conv2d_s2d(
    x: jax.Array,
    w: jax.Array,
    bias: Optional[jax.Array] = None,
    r: int = 2,
    precision: Any = None,
) -> jax.Array:
    """SAME-padded stride-1 conv via the phase-packed stride-r formulation.

    x: (B, H, W, cin); w: (K, K, cin, cout) HWIO, K odd. Falls back to the
    plain conv when H or W is not divisible by r (shapes are static under
    jit, so this branch costs nothing at runtime).
    """
    k = w.shape[0]
    p = k // 2
    b, h, wd, _ = x.shape
    cout = w.shape[3]
    if r == 1 or h % r or wd % r:
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=[(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
        )
    else:
        wp = s2d_pack_kernel(w, r)
        y = jax.lax.conv_general_dilated(
            x, wp, window_strides=(r, r), padding=[(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
        )
        # depth-to-space, phase-major channel order (matches the packing)
        y = y.reshape(b, h // r, wd // r, r, r, cout)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, wd, cout)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def conv_s2d_enter(
    x: jax.Array,
    w: jax.Array,
    bias: Optional[jax.Array] = None,
    r: int = 2,
    precision: Any = None,
) -> jax.Array:
    """Stride-1 KxK conv, ORIGINAL-layout input -> PHASE-PACKED output
    (B, H/r, W/r, r*r*cout), channel order (a, b, co). No depth-to-space —
    compose with conv_s2d_packed / depth_to_space. H, W must divide r."""
    k = w.shape[0]
    wp = s2d_pack_kernel(w, r)
    y = jax.lax.conv_general_dilated(
        x, wp, window_strides=(r, r), padding=[(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
    )
    if bias is not None:
        y = y + jnp.tile(bias, r * r).astype(y.dtype)
    return y


def s2d_pack_kernel_packed(w: jax.Array, r: int = 2):
    """Transform a stride-1 (K, K, cin, cout) kernel into the PACKED->PACKED
    kernel: input and output both in phase-packed layout. For r=2, K=7 or 9
    this is a 5x5 conv over 4*cin -> 4*cout channels (zero-filled where the
    phase geometry has no tap). Returns (kernel, left_pad) — pass
    padding=[(left_pad, T-1-left_pad)]*2 to the stride-1 packed conv.

        y[r p + a, co] = sum_dy x[r p + a + dy - h] w[dy]      (h = K // 2)
        x[r(p+u) + alpha]  with  u = (a + dy - h - alpha) / r

    Only derived for r=2 (odd K): each (a, alpha) pair selects the dy of one
    parity; taps form a stride-2 slice of w placed at consecutive u.
    """
    if r != 2:
        raise NotImplementedError("packed->packed kernels are derived for r=2")
    k = w.shape[0]
    if k % 2 == 0:
        raise ValueError(f"odd kernel required, got {w.shape}")
    h = k // 2
    us = [
        (a + dy - h - al) // 2
        for a in range(2) for al in range(2) for dy in range(k)
        if (a + dy - h - al) % 2 == 0
    ]
    u_min, u_max = min(us), max(us)
    t = u_max - u_min + 1
    blocks_in = []
    for al in range(2):
        for be in range(2):
            blocks_out = []
            for a in range(2):
                for b in range(2):
                    d0 = (h + al - a) % 2  # dy parity for this (a, alpha)
                    e0 = (h + be - b) % 2
                    sub = w[d0::2, e0::2]  # (n, m, cin, cout)
                    u0 = (a + d0 - h - al) // 2 - u_min
                    v0 = (b + e0 - h - be) // 2 - u_min
                    blocks_out.append(jnp.pad(
                        sub,
                        ((u0, t - u0 - sub.shape[0]),
                         (v0, t - v0 - sub.shape[1]), (0, 0), (0, 0))))
            # out channels (a, b, co)-major
            ob = jnp.stack(blocks_out, axis=3)  # (t, t, cin, 4, cout)
            blocks_in.append(ob.reshape(t, t, w.shape[2], 4 * w.shape[3]))
    wp = jnp.stack(blocks_in, axis=2)  # (t, t, 4, cin, 4cout)
    wp = wp.reshape(t, t, 4 * w.shape[2], 4 * w.shape[3])
    return wp, -u_min


def conv_s2d_packed(
    xp: jax.Array,
    w: jax.Array,
    bias: Optional[jax.Array] = None,
    precision: Any = None,
) -> jax.Array:
    """Stride-1 KxK conv in PACKED domain: xp (B, H/2, W/2, 4*cin) ->
    (B, H/2, W/2, 4*cout). w is the ORIGINAL (K, K, cin, cout) kernel."""
    wp, lpad = s2d_pack_kernel_packed(w, 2)
    t = wp.shape[0]
    y = jax.lax.conv_general_dilated(
        xp, wp, window_strides=(1, 1),
        padding=[(lpad, t - 1 - lpad)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
    )
    if bias is not None:
        y = y + jnp.tile(bias, 4).astype(y.dtype)
    return y


def conv_packed_1x1(
    xp: jax.Array,
    w: jax.Array,
    bias: Optional[jax.Array] = None,
    r: int = 2,
    precision: Any = None,
) -> jax.Array:
    """1x1 conv applied per-phase in the packed domain: a free reshape to
    (..., r*r, cin) + one dot over cin. Same FLOPs/lanes as the plain
    1x1; avoids leaving the packed layout. (A feature_group_count=r*r
    grouped conv is equivalent but its vmap batching rule rejects an
    unbatched kernel — clip-parallel adaptation vmaps this op.)
    w: (1, 1, cin, cout) or (cin, cout)."""
    if w.ndim == 4:
        w = w[0, 0]
    g = r * r
    cin, cout = w.shape
    b, hp, wp, _ = xp.shape
    x5 = xp.reshape(b, hp, wp, g, cin)
    y5 = jnp.einsum("bhwgc,cd->bhwgd", x5, w, precision=precision)
    y = y5.reshape(b, hp, wp, g * cout)
    if bias is not None:
        y = y + jnp.tile(bias, g).astype(y.dtype)
    return y


def depth_to_space(yp: jax.Array, r: int = 2) -> jax.Array:
    """Packed (B, H/r, W/r, r*r*C) -> original (B, H, W, C), phase-major
    channel order (matches s2d_pack_kernel / pixel_shuffle)."""
    b, hp, wp, crr = yp.shape
    c = crr // (r * r)
    y = yp.reshape(b, hp, wp, r, r, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp * r, wp * r, c)


# ---------------------------------------------------------------------------
# Channel-major 3-D variants (NDHWC, spatial-only packing, T passthrough).
#
# DUF's dense trunk (models/duf.py) is the target: 3x3x3 convs with
# cout = growth = 32 (1/4 of the MXU lanes) dominating ~80% of its serving
# FLOPs. Unlike SpyNet, the trunk CONCATENATES features after every layer
# (dense connectivity), so the packed channel order matters: with the
# 2-D path's PHASE-major order ((a, b, co) — pixel-shuffle-compatible),
# concat of two packed tensors interleaves wrongly and needs a channel
# permutation (an XLA copy — exactly the layout tax that made per-conv
# round-trips 3.2x slower, see module docstring). CHANNEL-major order
# (co * r^2 + phase) makes packed concat the identity:
#     concat_cm([4C1], [4C2]) == pack_cm(concat([C1], [C2]))
# so the whole dense chain stays packed with ZERO layout ops. BatchNorm
# runs on the free (..., C, r^2) reshape VIEW with feature axis -2 —
# the r^2 phases re-tile the same pixel set, so per-channel statistics
# are exact in both eval and train mode.
# ---------------------------------------------------------------------------


def s2d_pack_kernel_3d_cm(w: jax.Array, r: int = 2) -> jax.Array:
    """Embed a stride-1 (KT, K, K, cin, cout) DHWIO kernel into the
    spatially phase-packed stride-(1, r, r) kernel
    (KT, K+r-1, K+r-1, cin, cout*r*r), CHANNEL-major output order
    (packed channel = co * r^2 + (a*r + b))."""
    kt, k, k2, cin, cout = w.shape
    if k != k2 or k % 2 == 0:
        raise ValueError(f"square odd spatial kernel required, got {w.shape}")
    phases = [
        jnp.pad(w, ((0, 0), (a, r - 1 - a), (b, r - 1 - b), (0, 0), (0, 0)))
        for a in range(r)
        for b in range(r)
    ]
    st = jnp.stack(phases, axis=-1)  # (kt, kk, kk, cin, cout, r*r)
    kk = k + r - 1
    return st.reshape(kt, kk, kk, cin, cout * r * r)


def _t_pad(kt: int, t_valid: bool):
    return (0, 0) if (t_valid or kt == 1) else ((kt - 1) // 2, (kt - 1) // 2)


def conv_s2d_enter_3d_cm(
    x: jax.Array,
    w: jax.Array,
    bias: Optional[jax.Array] = None,
    r: int = 2,
    t_valid: bool = False,
    precision: Any = None,
) -> jax.Array:
    """Stride-1 (KT, K, K) conv, ORIGINAL-layout NDHWC input ->
    spatially PACKED output (B, T', H/r, W/r, r*r*cout), channel-major.
    H, W must divide r. T is untouched (SAME padded unless t_valid)."""
    kt, k = w.shape[0], w.shape[1]
    wp = s2d_pack_kernel_3d_cm(w, r)
    y = jax.lax.conv_general_dilated(
        x, wp, window_strides=(1, r, r),
        padding=[_t_pad(kt, t_valid), (k // 2, k // 2), (k // 2, k // 2)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), precision=precision,
    )
    if bias is not None:
        y = y + jnp.repeat(bias, r * r).astype(y.dtype)
    return y


def s2d_pack_kernel_packed_cm(w: jax.Array, r: int = 2):
    """PACKED->PACKED kernel, CHANNEL-major on both sides, for a stride-1
    (KT, K, K, cin, cout) kernel: returns ((KT, T, T, r*r*cin, r*r*cout),
    left_pad). Same phase geometry as s2d_pack_kernel_packed (each
    (out-phase, in-phase) pair selects one spatial parity slice of w),
    re-assembled so packed channel = c * r^2 + phase on input AND output.
    Only derived for r=2 (odd K)."""
    if r != 2:
        raise NotImplementedError("packed->packed kernels are derived for r=2")
    kt, k, k2, cin, cout = w.shape
    if k != k2 or k % 2 == 0:
        raise ValueError(f"square odd spatial kernel required, got {w.shape}")
    h = k // 2
    us = [
        (a + dy - h - al) // 2
        for a in range(2) for al in range(2) for dy in range(k)
        if (a + dy - h - al) % 2 == 0
    ]
    u_min, u_max = min(us), max(us)
    t = u_max - u_min + 1
    per_in = []
    for al in range(2):
        for be in range(2):
            outs = []
            for a in range(2):
                for b in range(2):
                    d0 = (h + al - a) % 2  # dy parity for this (a, alpha)
                    e0 = (h + be - b) % 2
                    sub = w[:, d0::2, e0::2]  # (kt, n, m, cin, cout)
                    u0 = (a + d0 - h - al) // 2 - u_min
                    v0 = (b + e0 - h - be) // 2 - u_min
                    outs.append(jnp.pad(
                        sub,
                        ((0, 0),
                         (u0, t - u0 - sub.shape[1]),
                         (v0, t - v0 - sub.shape[2]), (0, 0), (0, 0))))
            # (kt, t, t, cin, cout, 4out) — out channels (co, phase)-major
            per_in.append(jnp.stack(outs, axis=-1))
    # (kt, t, t, cin, 4in, cout, 4out) — in channels (ci, phase)-major
    wp = jnp.stack(per_in, axis=4)
    wp = wp.reshape(kt, t, t, 4 * cin, 4 * cout)
    return wp, -u_min


def conv_s2d_packed_3d_cm(
    xp: jax.Array,
    w: jax.Array,
    bias: Optional[jax.Array] = None,
    t_valid: bool = False,
    precision: Any = None,
) -> jax.Array:
    """Stride-1 (KT, K, K) conv in the spatially PACKED channel-major
    domain: xp (B, T, H/2, W/2, 4*cin) -> (B, T', H/2, W/2, 4*cout).
    w is the ORIGINAL (KT, K, K, cin, cout) kernel."""
    wp, lpad = s2d_pack_kernel_packed_cm(w, 2)
    kt, t = wp.shape[0], wp.shape[1]
    y = jax.lax.conv_general_dilated(
        xp, wp, window_strides=(1, 1, 1),
        padding=[_t_pad(kt, t_valid),
                 (lpad, t - 1 - lpad), (lpad, t - 1 - lpad)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"), precision=precision,
    )
    if bias is not None:
        y = y + jnp.repeat(bias, 4).astype(y.dtype)
    return y


def conv_packed_1x1_cm(
    xp: jax.Array,
    w: jax.Array,
    bias: Optional[jax.Array] = None,
    r: int = 2,
    precision: Any = None,
) -> jax.Array:
    """1x1(x1) conv in the channel-major packed domain: a free reshape to
    (..., cin, r*r) + one dot over cin — same FLOPs/lanes as the plain
    1x1, zero layout ops. w: (..., cin, cout) with any number of leading
    size-1 kernel dims (e.g. (1, 1, 1, cin, cout))."""
    while w.ndim > 2:
        if w.shape[0] != 1:
            raise ValueError(f"not a 1x1 kernel: {w.shape}")
        w = w[0]
    g = r * r
    cin, cout = w.shape
    lead = xp.shape[:-1]
    x5 = xp.reshape(lead + (cin, g))
    y5 = jnp.einsum("...cp,cd->...dp", x5, w, precision=precision)
    y = y5.reshape(lead + (cout * g,))
    if bias is not None:
        y = y + jnp.repeat(bias, g).astype(y.dtype)
    return y


def depth_to_space_cm(yp: jax.Array, r: int = 2) -> jax.Array:
    """Channel-major packed (..., H/r, W/r, C*r*r) -> original
    (..., H, W, C). Inverse of the _cm packing (channel = c*r^2 + a*r+b)."""
    lead = yp.shape[:-3]
    hp, wp, crr = yp.shape[-3:]
    c = crr // (r * r)
    n = len(lead)
    y = yp.reshape(lead + (hp, wp, c, r, r))
    # (..., hp, wp, c, a, b) -> (..., hp, a, wp, b, c)
    perm = tuple(range(n)) + (n, n + 3, n + 1, n + 4, n + 2)
    return y.transpose(perm).reshape(lead + (hp * r, wp * r, c))


class ConvParams(nn.Module):
    """Registers conv params with the exact nn.Conv pytree
    ({'kernel': (K, K, cin, cout), 'bias': (cout,)}) WITHOUT fixing the
    conv schedule — the caller applies the kernel functionally (plain,
    enter, packed, ...). Keeps checkpoints interchangeable across
    schedules and torch-importable (convert/torch_import.py)."""

    features: int
    kernel_size: Sequence[int]
    use_bias: bool = True

    @nn.compact
    def __call__(self, cin: int):
        k = tuple(self.kernel_size)  # any spatial rank (2-D convs, DUF's 3-D)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            k + (cin, self.features), jnp.float32)
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
            if self.use_bias else None)
        return kernel, bias


class ConvS2D(nn.Module):
    """Drop-in replacement for stride-1 SAME `nn.Conv` on lane-starved
    shapes. Parameter pytree ({'kernel': (K, K, cin, cout), 'bias':
    (cout,)}) is identical to nn.Conv — load-bearing for
    convert/torch_import.py and for existing orbax checkpoints."""

    features: int
    kernel_size: Sequence[int]
    use_bias: bool = True
    dtype: Any = None
    r: int = 2

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = tuple(self.kernel_size)
        if len(k) != 2 or k[0] != k[1]:
            raise ValueError(f"square 2-D kernel required, got {k}")
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k[0], k[1], cin, self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        dtype = self.dtype or x.dtype
        return conv2d_s2d(
            x.astype(dtype),
            kernel.astype(dtype),
            None if bias is None else bias,
            r=self.r,
        )
