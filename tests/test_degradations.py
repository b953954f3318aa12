import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynavsr_tpu.data.degradations import (
    _duf_kernel_np,
    anisotropic_kernel,
    blur_downsample,
    duf_downsample,
    isotropic_kernel,
    random_kernel_batch,
    synthesize_pair,
)


def test_isotropic_kernel_normalized_symmetric():
    k = np.asarray(isotropic_kernel(13, 1.5))
    assert abs(k.sum() - 1.0) < 1e-6
    np.testing.assert_allclose(k, k.T, atol=1e-7)
    np.testing.assert_allclose(k, k[::-1, ::-1], atol=1e-7)


def test_aniso_reduces_to_iso():
    ki = np.asarray(isotropic_kernel(13, 1.2))
    ka = np.asarray(anisotropic_kernel(13, 1.2, 1.2, 0.7))
    np.testing.assert_allclose(ki, ka, atol=1e-6)


def test_aniso_rotation():
    k = np.asarray(anisotropic_kernel(13, 3.0, 0.5, 0.0))
    # sigma_x > sigma_y with theta=0 -> elongated along x (columns).
    assert k[6, 2] > k[2, 6]


def test_random_kernel_batch_jit():
    f = jax.jit(lambda key: random_kernel_batch(key, 4, 13))
    ks = np.asarray(f(jax.random.PRNGKey(0)))
    assert ks.shape == (4, 13, 13)
    np.testing.assert_allclose(ks.sum(axis=(1, 2)), 1.0, atol=1e-5)
    assert not np.allclose(ks[0], ks[1])


def test_blur_downsample_shapes():
    x = jnp.ones((2, 32, 32, 3))
    k = isotropic_kernel(13, 1.5)
    out = blur_downsample(x, k, 4)
    assert out.shape == (2, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)


def test_blur_downsample_per_sample_kernels_video():
    x = jnp.ones((2, 3, 16, 16, 3))
    ks = random_kernel_batch(jax.random.PRNGKey(1), 2)
    out = blur_downsample(x, ks, 2)
    assert out.shape == (2, 3, 8, 8, 3)


def test_duf_kernel_matches_scipy():
    scipy_ndimage = pytest.importorskip("scipy.ndimage")
    for scale in (2, 3, 4):
        imp = np.zeros((13, 13))
        imp[6, 6] = 1.0
        ref = scipy_ndimage.gaussian_filter(imp, 0.4 * scale)
        np.testing.assert_allclose(_duf_kernel_np(scale), ref, atol=1e-12)


def test_duf_downsample_shapes():
    x = jnp.ones((2, 5, 64, 48, 3))
    out = duf_downsample(x, 4)
    assert out.shape == (2, 5, 16, 12, 3)
    out3 = duf_downsample(jnp.ones((1, 63, 63, 3)), 3)
    assert out3.shape == (1, 21, 21, 3)


def test_synthesize_pair():
    hr = jax.random.uniform(jax.random.PRNGKey(2), (2, 3, 32, 32, 3))
    lr, slr, kernels = jax.jit(lambda k, x: synthesize_pair(k, x, 4))(jax.random.PRNGKey(3), hr)
    assert lr.shape == (2, 3, 8, 8, 3)
    assert slr.shape == (2, 3, 2, 2, 3)
    assert kernels.shape == (2, 13, 13)


def test_synthesize_pair_noise():
    """noise_range: LR gets per-clip additive noise (clipped), SLR is the
    blur-down of the noisy LR; (0,0) stays the clean path."""
    import numpy as np

    hr = jax.random.uniform(jax.random.PRNGKey(2), (2, 3, 32, 32, 3))
    f = jax.jit(lambda k, x, nr: synthesize_pair(k, x, 4, noise_range=nr),
                static_argnums=2)
    lr0, slr0, k0 = f(jax.random.PRNGKey(3), hr, (0.0, 0.0))
    lrn, slrn, kn = f(jax.random.PRNGKey(3), hr, (0.05, 0.05))
    np.testing.assert_allclose(np.asarray(k0), np.asarray(kn), atol=1e-6)
    d = np.asarray(lrn) - np.asarray(lr0)
    # additive sigma=0.05 noise (minus clipping losses) on LR
    assert 0.02 < d.std() < 0.08
    assert float(np.abs(np.asarray(slrn) - np.asarray(slr0)).max()) > 1e-4
    assert np.asarray(lrn).min() >= 0.0 and np.asarray(lrn).max() <= 1.0
    # determinism in the key
    lrn2, _, _ = f(jax.random.PRNGKey(3), hr, (0.05, 0.05))
    np.testing.assert_allclose(np.asarray(lrn), np.asarray(lrn2), atol=0)


def test_synthesize_pair_kernel_stream_is_raw_key():
    """Regression: the kernel draw consumes the RAW key (noise keys are
    fold_in-derived), so same-seed runs reproduce the pre-noise-feature
    kernel stream that produced the committed round-3 artifacts, with or
    without noise enabled."""
    hr = jax.random.uniform(jax.random.PRNGKey(2), (2, 3, 32, 32, 3))
    key = jax.random.PRNGKey(7)
    _, _, k = synthesize_pair(key, hr, 4, noise_range=(0.0, 0.05))
    expect = random_kernel_batch(key, 2, 13, (0.2, 4.0), 0.5)
    np.testing.assert_allclose(np.asarray(k), np.asarray(expect), atol=0)
