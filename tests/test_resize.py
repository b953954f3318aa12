"""MATLAB-bicubic parity tests for dynavsr_tpu.data.resize."""

import numpy as np
import pytest

from dynavsr_tpu.data.resize import imresize, imresize_np, resize_weights


def test_weights_rows_sum_to_one():
    for in_len, out_len in [(16, 4), (64, 16), (7, 13), (100, 25)]:
        w = resize_weights(in_len, out_len, True)
        np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-12)


def test_identity_scale():
    rng = np.random.default_rng(0)
    img = rng.random((24, 20, 3))
    out = imresize_np(img, 1.0)
    np.testing.assert_allclose(out, img, atol=1e-10)


def test_constant_preserved():
    img = np.full((32, 32, 3), 0.5)
    out = imresize_np(img, 0.25)
    assert out.shape == (8, 8, 3)
    np.testing.assert_allclose(out, 0.5, atol=1e-10)


def test_matches_torch_antialiased_bicubic_interior():
    """PyTorch's antialiased bicubic uses the same Keys a=-0.5 kernel; away
    from borders (where boundary conventions differ) results must agree."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    img = rng.random((64, 48, 3)).astype(np.float32)
    ours = imresize_np(img, 0.25)
    t = torch.from_numpy(img).permute(2, 0, 1)[None]
    theirs = (
        F.interpolate(t, scale_factor=0.25, mode="bicubic", antialias=True)[0]
        .permute(1, 2, 0)
        .numpy()
    )
    np.testing.assert_allclose(ours[2:-2, 2:-2], theirs[2:-2, 2:-2], atol=2e-5)


def test_upscale_matches_torch_interior():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(2)
    img = rng.random((16, 12, 1)).astype(np.float32)
    ours = imresize_np(img, 4.0)
    t = torch.from_numpy(img).permute(2, 0, 1)[None]
    # antialias=True selects torch's PIL-compatible a=-0.5 kernel (same as
    # MATLAB); the default path uses a=-0.75 which is NOT MATLAB-compatible.
    theirs = (
        F.interpolate(t, scale_factor=4.0, mode="bicubic", antialias=True)[0]
        .permute(1, 2, 0)
        .numpy()
    )
    np.testing.assert_allclose(ours[8:-8, 8:-8], theirs[8:-8, 8:-8], atol=2e-5)


def test_jax_matches_numpy():
    rng = np.random.default_rng(3)
    img = rng.random((32, 28, 3)).astype(np.float32)
    ours_np = imresize_np(img, 0.25)
    ours_jax = np.asarray(imresize(img, 0.25))
    np.testing.assert_allclose(ours_jax, ours_np, atol=1e-5)


def test_jax_batched_leading_dims():
    rng = np.random.default_rng(4)
    vid = rng.random((2, 5, 16, 16, 3)).astype(np.float32)
    out = np.asarray(imresize(vid, 0.5))
    assert out.shape == (2, 5, 8, 8, 3)
    ref = imresize_np(vid[1, 3], 0.5)
    np.testing.assert_allclose(out[1, 3], ref, atol=1e-5)


def test_odd_sizes_ceil():
    img = np.zeros((7, 9, 1))
    out = imresize_np(img, 0.5)
    assert out.shape == (4, 5, 1)
