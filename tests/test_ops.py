"""Unit tests for grid_sample / flow_warp / pixel_shuffle / DCN reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynavsr_tpu.ops.dcn_ref import deform_conv2d_ref
from dynavsr_tpu.ops.grid_sample import bilinear_sample, flow_warp
from dynavsr_tpu.ops.pixelshuffle import pixel_shuffle


# ---------------------------------------------------------------- grid sample
def test_bilinear_sample_exact_pixels():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((5, 7, 3)).astype(np.float32))
    ys = jnp.asarray([[0.0, 4.0], [2.0, 1.0]])
    xs = jnp.asarray([[0.0, 6.0], [3.0, 5.0]])
    out = bilinear_sample(img, ys, xs)
    np.testing.assert_allclose(out[0, 0], img[0, 0], atol=1e-6)
    np.testing.assert_allclose(out[0, 1], img[4, 6], atol=1e-6)
    np.testing.assert_allclose(out[1, 0], img[2, 3], atol=1e-6)


def test_bilinear_sample_midpoint_and_outside():
    img = jnp.asarray(np.arange(4, dtype=np.float32).reshape(2, 2, 1))
    mid = bilinear_sample(img, jnp.asarray([0.5]), jnp.asarray([0.5]))
    np.testing.assert_allclose(mid[0, 0], 1.5, atol=1e-6)
    out = bilinear_sample(img, jnp.asarray([-5.0, 10.0]), jnp.asarray([0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)
    # Border fade: at y=-0.5, only the inside row contributes with weight 0.5.
    edge = bilinear_sample(img, jnp.asarray([-0.5]), jnp.asarray([0.0]))
    np.testing.assert_allclose(edge[0, 0], 0.5 * img[0, 0, 0], atol=1e-6)


def test_grid_sample_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    img = rng.random((2, 8, 9, 4)).astype(np.float32)
    flow = (rng.random((2, 8, 9, 2)).astype(np.float32) - 0.5) * 6.0

    ours = np.asarray(flow_warp(jnp.asarray(img), jnp.asarray(flow)))

    t_img = torch.from_numpy(img).permute(0, 3, 1, 2)
    t_flow = torch.from_numpy(flow)
    h, w = 8, 9
    gy, gx = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    vx = gx[None] + t_flow[..., 0]
    vy = gy[None] + t_flow[..., 1]
    gxn = 2.0 * vx / max(w - 1, 1) - 1.0
    gyn = 2.0 * vy / max(h - 1, 1) - 1.0
    grid = torch.stack([gxn, gyn], dim=-1)
    theirs = (
        F.grid_sample(t_img, grid, mode="bilinear", padding_mode="zeros", align_corners=True)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


# --------------------------------------------------------------- pixelshuffle
def test_pixel_shuffle_matches_torch():
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(2)
    x = rng.random((2, 3, 4, 16)).astype(np.float32)  # NHWC, C = 4*2*2
    ours = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    theirs = (
        torch.pixel_shuffle(torch.from_numpy(x).permute(0, 3, 1, 2), 2)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=0)


def test_pixel_shuffle_leading_dims():
    x = jnp.ones((2, 5, 3, 4, 16))
    assert pixel_shuffle(x, 2).shape == (2, 5, 6, 8, 4)


# ------------------------------------------------------------------------ DCN
def _dcn_numpy_oracle(x, offset, mask, weight, stride, padding, dilation, groups, gd):
    """Direct, slow numpy modulated deform conv (CUDA-kernel semantics)."""
    b, h, w, cin = x.shape
    kh, kw, cin_g, cout = weight.shape
    k = kh * kw
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    cg = cin // gd
    cout_g = cout // groups
    out = np.zeros((b, ho, wo, cout))

    def sample(img2d, y, xx):
        hh, ww = img2d.shape
        if y <= -1 or xx <= -1 or y >= hh or xx >= ww:
            return 0.0
        y0, x0 = int(np.floor(y)), int(np.floor(xx))
        v = 0.0
        for dy2 in (0, 1):
            for dx2 in (0, 1):
                yy, xc = y0 + dy2, x0 + dx2
                if 0 <= yy < hh and 0 <= xc < ww:
                    wy = 1 - abs(y - yy)
                    wx = 1 - abs(xx - xc)
                    v += wy * wx * img2d[yy, xc]
        return v

    for bi in range(b):
        for oy in range(ho):
            for ox in range(wo):
                for oc in range(cout):
                    g = oc // cout_g
                    acc = 0.0
                    for ky in range(kh):
                        for kx in range(kw):
                            ki = ky * kw + kx
                            for ic_l in range(cin_g):
                                ic = g * cin_g + ic_l
                                dg = ic // cg
                                dy = offset[bi, oy, ox, 2 * (dg * k + ki)]
                                dx = offset[bi, oy, ox, 2 * (dg * k + ki) + 1]
                                m = 1.0 if mask is None else mask[bi, oy, ox, dg * k + ki]
                                y = oy * stride - padding + ky * dilation + dy
                                xx = ox * stride - padding + kx * dilation + dx
                                acc += (
                                    sample(x[bi, :, :, ic], y, xx)
                                    * m
                                    * weight[ky, kx, ic_l, oc]
                                )
                    out[bi, oy, ox, oc] = acc
    return out


def test_dcn_zero_offset_equals_conv():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((2, 8, 8, 4)).astype(np.float32))
    weight = jnp.asarray(rng.random((3, 3, 4, 6)).astype(np.float32))
    offset = jnp.zeros((2, 8, 8, 2 * 9))
    mask = jnp.ones((2, 8, 8, 9))
    out = deform_conv2d_ref(x, offset, mask, weight)
    ref = jax.lax.conv_general_dilated(
        x, weight, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize("groups,gd", [(1, 1), (1, 2), (2, 2)])
def test_dcn_matches_numpy_oracle(groups, gd):
    rng = np.random.default_rng(4)
    b, h, w, cin, cout = 1, 5, 6, 4, 4
    kh = kw = 3
    k = kh * kw
    x = rng.random((b, h, w, cin)).astype(np.float32)
    weight = (rng.random((kh, kw, cin // groups, cout)).astype(np.float32) - 0.5)
    offset = ((rng.random((b, h, w, 2 * gd * k)) - 0.5) * 4).astype(np.float32)
    mask = rng.random((b, h, w, gd * k)).astype(np.float32)

    ours = np.asarray(
        deform_conv2d_ref(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask), jnp.asarray(weight),
            groups=groups, deformable_groups=gd,
        )
    )
    oracle = _dcn_numpy_oracle(x, offset, mask, weight, 1, 1, 1, groups, gd)
    np.testing.assert_allclose(ours, oracle, atol=1e-4)


def test_dcn_no_mask_is_dcnv1():
    rng = np.random.default_rng(5)
    x = rng.random((1, 5, 5, 2)).astype(np.float32)
    weight = rng.random((3, 3, 2, 3)).astype(np.float32)
    offset = ((rng.random((1, 5, 5, 18)) - 0.5) * 3).astype(np.float32)
    ours = np.asarray(
        deform_conv2d_ref(jnp.asarray(x), jnp.asarray(offset), None, jnp.asarray(weight))
    )
    oracle = _dcn_numpy_oracle(x, offset, None, weight, 1, 1, 1, 1, 1)
    np.testing.assert_allclose(ours, oracle, atol=1e-4)


def test_dcn_stride_2():
    rng = np.random.default_rng(6)
    x = rng.random((1, 9, 9, 2)).astype(np.float32)
    weight = rng.random((3, 3, 2, 3)).astype(np.float32)
    offset = ((rng.random((1, 5, 5, 18)) - 0.5) * 3).astype(np.float32)
    mask = rng.random((1, 5, 5, 9)).astype(np.float32)
    ours = np.asarray(
        deform_conv2d_ref(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask), jnp.asarray(weight),
            stride=2,
        )
    )
    assert ours.shape == (1, 5, 5, 3)
    oracle = _dcn_numpy_oracle(x, offset, mask, weight, 2, 1, 1, 1, 1)
    np.testing.assert_allclose(ours, oracle, atol=1e-4)


def test_dcn_grads_flow():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.random((1, 6, 6, 4)).astype(np.float32))
    weight = jnp.asarray(rng.random((3, 3, 4, 4)).astype(np.float32))
    offset = jnp.asarray(((rng.random((1, 6, 6, 2 * 9)) - 0.5) * 2).astype(np.float32))
    mask = jnp.asarray(rng.random((1, 6, 6, 9)).astype(np.float32))

    def loss(x, offset, mask, weight):
        return jnp.sum(deform_conv2d_ref(x, offset, mask, weight) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(x, offset, mask, weight)
    for g in grads:
        assert bool(jnp.all(jnp.isfinite(g)))
        assert float(jnp.abs(g).max()) > 0


# ------------------------------------------------------- fused (production) DCN
def test_dcn_fused_matches_ref():
    from dynavsr_tpu.ops.dcn_fused import deform_conv2d_fused

    rng = np.random.default_rng(8)
    for groups, gd, stride in [(1, 1, 1), (1, 2, 1), (2, 2, 1), (1, 1, 2)]:
        b, h, cin, cout = 2, 7, 4, 4
        w = 6
        k = 9
        ho = (h + 2 - 3) // stride + 1
        wo = (w + 2 - 3) // stride + 1
        x = jnp.asarray(rng.random((b, h, w, cin)).astype(np.float32))
        weight = jnp.asarray(
            (rng.random((3, 3, cin // groups, cout)) - 0.5).astype(np.float32))
        bias = jnp.asarray(rng.random((cout,)).astype(np.float32))
        offset = jnp.asarray(
            ((rng.random((b, ho, wo, 2 * gd * k)) - 0.5) * 4).astype(np.float32))
        mask = jnp.asarray(rng.random((b, ho, wo, gd * k)).astype(np.float32))
        ref = deform_conv2d_ref(x, offset, mask, weight, bias, stride=stride,
                                groups=groups, deformable_groups=gd)
        fused = deform_conv2d_fused(x, offset, mask, weight, bias, stride=stride,
                                    groups=groups, deformable_groups=gd)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)


def test_dcn_fused_no_mask_matches_ref():
    from dynavsr_tpu.ops.dcn_fused import deform_conv2d_fused

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.random((1, 5, 5, 2)).astype(np.float32))
    weight = jnp.asarray(rng.random((3, 3, 2, 3)).astype(np.float32))
    offset = jnp.asarray(((rng.random((1, 5, 5, 18)) - 0.5) * 3).astype(np.float32))
    ref = deform_conv2d_ref(x, offset, None, weight)
    fused = deform_conv2d_fused(x, offset, None, weight)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-4)


def test_dcn_fused_grads_match_ref():
    from dynavsr_tpu.ops.dcn_fused import deform_conv2d_fused

    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.random((1, 6, 6, 4)).astype(np.float32))
    weight = jnp.asarray((rng.random((3, 3, 4, 4)) - 0.5).astype(np.float32))
    bias = jnp.asarray(rng.random((4,)).astype(np.float32))
    # random float offsets land on integers with probability ~0, so the
    # floor() kink (where ref/fused grads could differ) is not hit
    offset = jnp.asarray(
        ((rng.random((1, 6, 6, 2 * 2 * 9)) - 0.5) * 2).astype(np.float32))
    mask = jnp.asarray(rng.random((1, 6, 6, 2 * 9)).astype(np.float32))

    def make_loss(fn):
        def loss(x, offset, mask, weight, bias):
            return jnp.sum(fn(x, offset, mask, weight, bias,
                              deformable_groups=2) ** 2)
        return loss

    g_ref = jax.grad(make_loss(deform_conv2d_ref), argnums=(0, 1, 2, 3, 4))(
        x, offset, mask, weight, bias)
    g_fused = jax.grad(make_loss(deform_conv2d_fused), argnums=(0, 1, 2, 3, 4))(
        x, offset, mask, weight, bias)
    for a, b_ in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-3, rtol=1e-3)


# ------------------------------------------------- pipelined (serving) DCN
def test_dcn_pipelined_matches_ref():
    from dynavsr_tpu.ops.dcn_fused import deform_conv2d_pipelined

    rng = np.random.default_rng(11)
    for groups, gd, stride in [(1, 1, 1), (1, 2, 1), (2, 2, 1), (1, 1, 2)]:
        b, h, cin, cout = 3, 7, 4, 4
        w = 6
        k = 9
        ho = (h + 2 - 3) // stride + 1
        wo = (w + 2 - 3) // stride + 1
        x = jnp.asarray(rng.random((b, h, w, cin)).astype(np.float32))
        weight = jnp.asarray(
            (rng.random((3, 3, cin // groups, cout)) - 0.5).astype(np.float32))
        bias = jnp.asarray(rng.random((cout,)).astype(np.float32))
        offset = jnp.asarray(
            ((rng.random((b, ho, wo, 2 * gd * k)) - 0.5) * 4).astype(np.float32))
        mask = jnp.asarray(rng.random((b, ho, wo, gd * k)).astype(np.float32))
        ref = deform_conv2d_ref(x, offset, mask, weight, bias, stride=stride,
                                groups=groups, deformable_groups=gd)
        pipe = deform_conv2d_pipelined(x, offset, mask, weight, bias,
                                       stride=stride, groups=groups,
                                       deformable_groups=gd)
        np.testing.assert_allclose(np.asarray(pipe), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)


def test_dcn_pipelined_grads_match_ref():
    from dynavsr_tpu.ops.dcn_fused import deform_conv2d_pipelined

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.random((2, 6, 6, 4)).astype(np.float32))
    weight = jnp.asarray((rng.random((3, 3, 4, 4)) - 0.5).astype(np.float32))
    bias = jnp.asarray(rng.random((4,)).astype(np.float32))
    offset = jnp.asarray(
        ((rng.random((2, 6, 6, 2 * 2 * 9)) - 0.5) * 2).astype(np.float32))
    mask = jnp.asarray(rng.random((2, 6, 6, 2 * 9)).astype(np.float32))

    def make_loss(fn):
        def loss(x, offset, mask, weight, bias):
            return jnp.sum(fn(x, offset, mask, weight, bias,
                              deformable_groups=2) ** 2)
        return loss

    g_ref = jax.grad(make_loss(deform_conv2d_ref), argnums=(0, 1, 2, 3, 4))(
        x, offset, mask, weight, bias)
    g_pipe = jax.grad(make_loss(deform_conv2d_pipelined), argnums=(0, 1, 2, 3, 4))(
        x, offset, mask, weight, bias)
    for a, b_ in zip(g_pipe, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-3, rtol=1e-3)


def test_dcn_pipelined_gd1_matches_ref():
    from dynavsr_tpu.ops.dcn_fused import deform_conv2d_pipelined

    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.random((4, 5, 5, 2)).astype(np.float32))
    weight = jnp.asarray(rng.random((3, 3, 2, 3)).astype(np.float32))
    offset = jnp.asarray(((rng.random((4, 5, 5, 18)) - 0.5) * 3).astype(np.float32))
    ref = deform_conv2d_ref(x, offset, None, weight)
    pipe = deform_conv2d_pipelined(x, offset, None, weight)
    np.testing.assert_allclose(np.asarray(pipe), np.asarray(ref), atol=1e-4)


def test_dcn_fused_chunked_parity():
    """Frame-chunking (the 2 MB default packs several small frames per scan
    step) must be numerically invisible, including at batch sizes the chunk
    width does not divide (fc falls back to a divisor) and for grads."""
    from dynavsr_tpu.ops.dcn_fused import (
        _VMEM_SRC_BUDGET,
        deform_conv2d_fused,
        set_frame_chunk_budget,
    )

    rng = np.random.default_rng(21)
    gd, cin, cout, k = 2, 4, 4, 9
    h, w = 6, 6

    def make(b):
        x = jnp.asarray(rng.random((b, h, w, cin)).astype(np.float32))
        weight = jnp.asarray(
            (rng.random((3, 3, cin, cout)) - 0.5).astype(np.float32))
        offset = jnp.asarray(
            ((rng.random((b, h, w, 2 * gd * k)) - 0.5) * 4).astype(np.float32))
        mask = jnp.asarray(rng.random((b, h, w, gd * k)).astype(np.float32))
        return x, offset, mask, weight

    try:
        for b in (6, 5):  # 5 is prime: fc must fall back to 5 or 1
            x, offset, mask, weight = make(b)
            src_frame = (h + 4) * (w + 4) * gd * 4 * (cin // gd) * 4
            set_frame_chunk_budget(0)
            ref = deform_conv2d_fused(x, offset, mask, weight,
                                      deformable_groups=gd)
            gref = jax.grad(lambda *a: jnp.sum(
                deform_conv2d_fused(*a, deformable_groups=gd)))(x, offset, mask, weight)
            set_frame_chunk_budget(src_frame * 3)  # fc=3 for b=6
            out = deform_conv2d_fused(x, offset, mask, weight,
                                      deformable_groups=gd)
            gout = jax.grad(lambda *a: jnp.sum(
                deform_conv2d_fused(*a, deformable_groups=gd)))(x, offset, mask, weight)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=1e-4, rtol=1e-4)
            np.testing.assert_allclose(np.asarray(gout), np.asarray(gref),
                                       atol=1e-4, rtol=1e-4)
    finally:
        set_frame_chunk_budget(_VMEM_SRC_BUDGET)


# ---------------------------------------------------------------- conv s2d
from dynavsr_tpu.ops.conv_s2d import ConvS2D, conv2d_s2d  # noqa: E402


@pytest.mark.parametrize("k,cin,cout,h,w,r", [
    (7, 8, 32, 16, 20, 2),
    (7, 16, 2, 12, 12, 2),
    (9, 21, 64, 18, 14, 2),
    (3, 4, 8, 8, 8, 2),
    (7, 8, 16, 12, 16, 4),
])
def test_conv_s2d_matches_plain(k, cin, cout, h, w, r):
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, h, w, cin)).astype(np.float32))
    wk = jnp.asarray(rng.standard_normal((k, k, cin, cout)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal((cout,)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, wk, (1, 1), [(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    out = conv2d_s2d(x, wk, b, r=r)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-4)


def test_conv_s2d_odd_shape_falls_back():
    # H=13 not divisible by r: must still produce the exact stride-1 result
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((1, 13, 11, 4)).astype(np.float32))
    wk = jnp.asarray(rng.standard_normal((7, 7, 4, 8)).astype(np.float32) * 0.1)
    ref = jax.lax.conv_general_dilated(
        x, wk, (1, 1), [(3, 3)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(
        np.asarray(conv2d_s2d(x, wk)), np.asarray(ref), atol=1e-5)


def test_conv_s2d_grads_match_plain():
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)).astype(np.float32))
    wk = jnp.asarray(rng.standard_normal((7, 7, 3, 4)).astype(np.float32) * 0.1)

    def loss_plain(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(3, 3)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y * y)

    def loss_s2d(x, w):
        y = conv2d_s2d(x, w)
        return jnp.sum(y * y)

    gx_p, gw_p = jax.grad(loss_plain, argnums=(0, 1))(x, wk)
    gx_s, gw_s = jax.grad(loss_s2d, argnums=(0, 1))(x, wk)
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_p), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_s), np.asarray(gw_p), atol=2e-3, rtol=1e-3)


def test_conv_s2d_module_param_tree_matches_nn_conv():
    import flax.linen as nn

    x = jnp.zeros((1, 8, 8, 5))
    m_s2d = ConvS2D(16, (7, 7))
    m_ref = nn.Conv(16, (7, 7))
    p_s2d = m_s2d.init(jax.random.PRNGKey(0), x)
    p_ref = m_ref.init(jax.random.PRNGKey(0), x)
    shapes = lambda t: jax.tree_util.tree_map(lambda a: a.shape, t)  # noqa: E731
    assert shapes(p_s2d) == shapes(p_ref)
    # same params -> same function (within reordering tolerance)
    out_s2d = m_s2d.apply(p_ref, jnp.ones((1, 8, 8, 5)))
    out_ref = m_ref.apply(p_ref, jnp.ones((1, 8, 8, 5)))
    np.testing.assert_allclose(np.asarray(out_s2d), np.asarray(out_ref),
                               atol=1e-5, rtol=1e-5)


def _s2d(x, r=2):
    b, h, w, c = x.shape
    y = x.reshape(b, h // r, r, w // r, r, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // r, w // r, r * r * c)


def _plain(x, w):
    p = w.shape[0] // 2
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(p, p)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("k", [3, 7, 9])
def test_conv_s2d_packed_matches_plain(k):
    from dynavsr_tpu.ops.conv_s2d import conv_s2d_packed, depth_to_space

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 12, 16, 5)).astype(np.float32))
    wk = jnp.asarray(rng.standard_normal((k, k, 5, 6)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal((6,)).astype(np.float32))
    out = depth_to_space(conv_s2d_packed(_s2d(x), wk, b))
    ref = _plain(x, wk) + b
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


def test_conv_s2d_enter_packed_chain():
    """enter -> packed -> packed -> d2s == three chained plain convs."""
    from dynavsr_tpu.ops.conv_s2d import (
        conv_s2d_enter, conv_s2d_packed, depth_to_space)

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((1, 10, 14, 4)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((7, 7, 4, 8)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((7, 7, 8, 6)).astype(np.float32) * 0.1)
    w3 = jnp.asarray(rng.standard_normal((9, 9, 6, 2)).astype(np.float32) * 0.1)
    yp = conv_s2d_enter(x, w1)
    yp = conv_s2d_packed(yp, w2)
    yp = conv_s2d_packed(yp, w3)
    out = depth_to_space(yp)
    ref = _plain(_plain(_plain(x, w1), w2), w3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=1e-3)


def test_conv_packed_1x1_matches_plain():
    from dynavsr_tpu.ops.conv_s2d import conv_packed_1x1, depth_to_space

    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 6)).astype(np.float32))
    wk = jnp.asarray(rng.standard_normal((1, 1, 6, 4)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((4,)).astype(np.float32))
    out = depth_to_space(conv_packed_1x1(_s2d(x), wk, b))
    ref = _plain(x, wk) + b
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_chunked_apply_remainder_and_passthrough():
    """adapt.chunked_apply: chunk that does not divide F pads with zero
    windows and slices them off; chunk=0 / chunk>=F is the plain batch."""
    from dynavsr_tpu.adapt.adaptation import chunked_apply

    apply = lambda p, x: x * p + 1.0  # noqa: E731 — shape-preserving stub
    x = jnp.arange(5 * 2 * 3, dtype=jnp.float32).reshape(5, 2, 3)
    ref = np.asarray(apply(2.0, x))
    for chunk in (0, 1, 2, 3, 5, 7):
        out = np.asarray(chunked_apply(apply, 2.0, x, chunk))
        np.testing.assert_allclose(out, ref, atol=0)


def test_conv_s2d_3d_cm_family_matches_plain():
    """Channel-major 3-D s2d family (DUF trunk): enter + packed 3x3x3
    (SAME and t_valid T) + packed 1x1x1 + depth-to-space each match the
    plain NDHWC convs, and channel-major packed concat IS the packed
    concat (the property that keeps DUF's dense chain layout-free)."""
    from dynavsr_tpu.ops.conv_s2d import (
        conv_packed_1x1_cm,
        conv_s2d_enter_3d_cm,
        conv_s2d_packed_3d_cm,
        depth_to_space_cm,
    )

    def plain(x, w, b, t_valid=False):
        kt, k = w.shape[0], w.shape[1]
        pt = (0, 0) if (t_valid or kt == 1) else ((kt - 1) // 2,) * 2
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), [pt, (k // 2,) * 2, (k // 2,) * 2],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return y + b

    rng = np.random.default_rng(5)
    t = lambda *s: jnp.asarray(  # noqa: E731
        rng.standard_normal(s).astype(np.float32) * 0.2)
    x = t(2, 5, 8, 12, 6)
    w1, b1 = t(1, 3, 3, 6, 7), t(7)
    w2, b2 = t(3, 3, 3, 7, 5), t(5)
    w4, b4 = t(1, 1, 1, 7, 9), t(9)

    yp = conv_s2d_enter_3d_cm(x, w1, b1)
    r1 = plain(x, w1, b1)
    np.testing.assert_allclose(np.asarray(depth_to_space_cm(yp)),
                               np.asarray(r1), atol=2e-5, rtol=1e-5)
    for t_valid in (False, True):
        out = depth_to_space_cm(conv_s2d_packed_3d_cm(yp, w2, b2, t_valid))
        ref = plain(r1, w2, b2, t_valid)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)
    out1 = conv_packed_1x1_cm(yp, w4, b4)
    np.testing.assert_allclose(np.asarray(depth_to_space_cm(out1)),
                               np.asarray(plain(r1, w4, b4)),
                               atol=2e-5, rtol=1e-5)
    # concat property: channel-major blocks concatenate natively
    cat = jnp.concatenate([conv_s2d_packed_3d_cm(yp, w2, b2), out1], -1)
    ref_cat = jnp.concatenate([plain(r1, w2, b2), plain(r1, w4, b4)], -1)
    np.testing.assert_allclose(np.asarray(depth_to_space_cm(cat)),
                               np.asarray(ref_cat), atol=2e-5, rtol=1e-5)


def test_conv_s2d_3d_cm_grads_match_plain():
    """Kernel gradients through the packed 3-D chain match the plain chain
    (the packed trunk trains — supervised DUF uses even crop sizes)."""
    from dynavsr_tpu.ops.conv_s2d import (
        conv_s2d_enter_3d_cm,
        conv_s2d_packed_3d_cm,
        depth_to_space_cm,
    )

    rng = np.random.default_rng(9)
    t = lambda *s: jnp.asarray(  # noqa: E731
        rng.standard_normal(s).astype(np.float32) * 0.2)
    x = t(1, 3, 8, 8, 4)
    w1, w2 = t(1, 3, 3, 4, 6), t(3, 3, 3, 6, 5)

    def loss_packed(ws):
        y = conv_s2d_enter_3d_cm(x, ws[0])
        return jnp.sum(depth_to_space_cm(conv_s2d_packed_3d_cm(y, ws[1])) ** 2)

    def loss_plain(ws):
        def pl(v, w):
            k = w.shape[1]
            return jax.lax.conv_general_dilated(
                v, w, (1, 1, 1),
                [((w.shape[0] - 1) // 2,) * 2, (k // 2,) * 2, (k // 2,) * 2],
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return jnp.sum(pl(pl(x, ws[0]), ws[1]) ** 2)

    gp = jax.grad(loss_packed)((w1, w2))
    gr = jax.grad(loss_plain)((w1, w2))
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=1e-4)
