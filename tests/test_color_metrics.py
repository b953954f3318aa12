import numpy as np
import pytest

from dynavsr_tpu.data.color import bgr2ycbcr, rgb2ycbcr, ycbcr2rgb
from dynavsr_tpu.eval.metrics import calculate_psnr, calculate_ssim


def test_ycbcr_known_values():
    # White (255,255,255) -> Y=235.0 ; black -> 16.0 (BT.601 TV range).
    white = np.full((1, 1, 3), 255, dtype=np.uint8)
    black = np.zeros((1, 1, 3), dtype=np.uint8)
    assert bgr2ycbcr(white, only_y=True)[0, 0] == 235
    assert bgr2ycbcr(black, only_y=True)[0, 0] == 16
    full = bgr2ycbcr(white, only_y=False)
    np.testing.assert_array_equal(full[0, 0], [235, 128, 128])


def test_bgr_rgb_consistency():
    rng = np.random.default_rng(0)
    img = rng.random((8, 8, 3)).astype(np.float32)
    np.testing.assert_allclose(
        bgr2ycbcr(img, only_y=True), rgb2ycbcr(img[..., ::-1], only_y=True), atol=1e-6
    )


def test_ycbcr_roundtrip_float():
    rng = np.random.default_rng(1)
    img = (rng.random((8, 8, 3)).astype(np.float64) * 0.8 + 0.1)
    rec = ycbcr2rgb(rgb2ycbcr(img, only_y=False))
    np.testing.assert_allclose(rec, img, atol=1e-6)


def test_psnr_basic():
    a = np.zeros((16, 16), dtype=np.uint8)
    b = np.full((16, 16), 10, dtype=np.uint8)
    expected = 20 * np.log10(255.0 / 10.0)
    assert abs(calculate_psnr(a, b) - expected) < 1e-9
    assert calculate_psnr(a, a) == float("inf")


def test_ssim_identical_is_one():
    rng = np.random.default_rng(2)
    img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    assert calculate_ssim(img, img) == pytest.approx(1.0)


def test_ssim_noise_lowers():
    rng = np.random.default_rng(3)
    img = (rng.random((48, 48)) * 255).astype(np.uint8)
    noisy = np.clip(img.astype(np.int32) + rng.integers(-25, 25, img.shape), 0, 255).astype(np.uint8)
    s = calculate_ssim(img, noisy)
    assert 0.0 < s < 0.99


def test_ssim_matches_skimage_if_available():
    skimage = pytest.importorskip("skimage")
    from skimage.metrics import structural_similarity

    rng = np.random.default_rng(4)
    a = (rng.random((64, 64)) * 255).astype(np.uint8)
    b = np.clip(a.astype(np.int32) + rng.integers(-20, 20, a.shape), 0, 255).astype(np.uint8)
    ours = calculate_ssim(a, b)
    theirs = structural_similarity(a, b, win_size=11, gaussian_weights=True, sigma=1.5,
                                   use_sample_covariance=False, data_range=255)
    assert abs(ours - theirs) < 5e-3
