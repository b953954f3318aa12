"""Parity vs REAL torch (cpu) for the semantics the checkpoints depend on.

The ≤0.05 dB goal hinges on these ops matching torch exactly (SURVEY.md §7
hard-parts #3/#4); handwritten oracles can share an author's blind spot —
torch itself cannot.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp


def test_interpolate_bilinear_matches_torch():
    from dynavsr_tpu.models.arch_util import interpolate_bilinear

    rng = np.random.default_rng(0)
    x = rng.random((2, 7, 9, 5)).astype(np.float32)
    ours = np.asarray(interpolate_bilinear(jnp.asarray(x), 2))
    with torch.no_grad():
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), scale_factor=2,
            mode="bilinear", align_corners=False,
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_pools_match_torch():
    from dynavsr_tpu.models.arch_util import avg_pool_3x3_s2, max_pool_3x3_s2

    rng = np.random.default_rng(1)
    x = rng.random((2, 9, 12, 4)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        mref = torch.nn.functional.max_pool2d(xt, 3, 2, 1).numpy().transpose(0, 2, 3, 1)
        aref = torch.nn.functional.avg_pool2d(
            xt, 3, 2, 1, count_include_pad=True).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(max_pool_3x3_s2(jnp.asarray(x))), mref, atol=1e-6)
    np.testing.assert_allclose(np.asarray(avg_pool_3x3_s2(jnp.asarray(x))), aref, atol=1e-6)


def test_pixel_shuffle_matches_torch():
    from dynavsr_tpu.ops.pixelshuffle import pixel_shuffle

    rng = np.random.default_rng(2)
    x = rng.random((2, 5, 6, 12)).astype(np.float32)  # C = 3 * 2^2
    ours = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    with torch.no_grad():
        ref = torch.pixel_shuffle(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), 2
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(ours, ref)


def test_flow_warp_matches_torch_grid_sample():
    """Reference arch_util.flow_warp: grid_sample(bilinear, zeros,
    align_corners=True) over grid+flow."""
    from dynavsr_tpu.ops.grid_sample import flow_warp

    rng = np.random.default_rng(3)
    b, h, w, c = 2, 8, 10, 4
    x = rng.random((b, h, w, c)).astype(np.float32)
    flow = ((rng.random((b, h, w, 2)) - 0.5) * 4).astype(np.float32)

    ours = np.asarray(flow_warp(jnp.asarray(x), jnp.asarray(flow)))

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ft = torch.from_numpy(flow)
    gy, gx = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    grid = torch.stack([gx, gy], dim=-1).float()[None].repeat(b, 1, 1, 1)
    vgrid = grid + ft  # flow[...,0]=dx, flow[...,1]=dy (torch convention)
    vgrid_x = 2.0 * vgrid[..., 0] / max(w - 1, 1) - 1.0
    vgrid_y = 2.0 * vgrid[..., 1] / max(h - 1, 1) - 1.0
    vgrid_scaled = torch.stack([vgrid_x, vgrid_y], dim=-1)
    with torch.no_grad():
        ref = torch.nn.functional.grid_sample(
            xt, vgrid_scaled, mode="bilinear", padding_mode="zeros",
            align_corners=True,
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_leaky_relu_slope():
    from dynavsr_tpu.models.arch_util import lrelu

    x = np.asarray([-2.0, -0.5, 0.0, 1.5], np.float32)
    ref = torch.nn.functional.leaky_relu(torch.from_numpy(x), 0.1).numpy()
    np.testing.assert_allclose(np.asarray(lrelu(jnp.asarray(x))), ref)


def test_strided_conv_matches_torch():
    """The fea_L2/L3 stride-2 convs: torch pads symmetrically; XLA 'SAME'
    wouldn't — our explicit padding must match torch."""
    import flax.linen as nn

    from dynavsr_tpu.convert.torch_import import convert_state_dict

    rng = np.random.default_rng(4)
    x = rng.random((1, 9, 11, 4)).astype(np.float32)
    tconv = torch.nn.Conv2d(4, 6, 3, stride=2, padding=1)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(6, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                           name="c")(x)

    m = M()
    params = convert_state_dict(
        {"c.weight": tconv.weight.detach().numpy(),
         "c.bias": tconv.bias.detach().numpy()},
        m.init(jax.random.PRNGKey(0), jnp.asarray(x)),
    )
    ours = np.asarray(m.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-5)
