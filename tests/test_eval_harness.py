"""Eval harness tests: batched clip evaluation, metric conventions."""

import numpy as np
import pytest

from dynavsr_tpu.eval.harness import evaluate_clip, evaluate_dataset, score_frames


def _upscale4(windows):
    """Fake SR: nearest-upscale each window's center frame."""
    center = windows[:, windows.shape[1] // 2]
    return center.repeat(4, axis=1).repeat(4, axis=2)


def test_evaluate_clip_scores_and_chunks(tmp_path):
    rng = np.random.default_rng(0)
    t, h, w = 7, 8, 6
    lq = rng.random((t, h, w, 3)).astype(np.float32)
    gt = lq.repeat(4, axis=1).repeat(4, axis=2)  # nearest-up is then exact
    res = evaluate_clip(_upscale4, lq, gt, n_frames=3, padding="reflection",
                        chunk=2, save_dir=str(tmp_path / "imgs"))
    assert res["frames"] == t
    assert len(res["psnr"]) == t
    assert res["psnr_avg"] == float("inf") or res["psnr_avg"] > 50
    import os
    assert len(os.listdir(tmp_path / "imgs")) == t


def test_score_frames_border_and_y():
    rng = np.random.default_rng(1)
    sr = rng.random((3, 24, 24, 3)).astype(np.float32)
    gt = sr.copy()
    gt[:, :2] = 0  # corrupt a border strip
    full = score_frames(sr, gt)
    cropped = score_frames(sr, gt, crop_border=2)
    assert cropped["psnr_avg"] > full["psnr_avg"]
    y = score_frames(sr, gt, ycbcr=True, crop_border=2)
    assert np.isfinite(y["psnr_avg"]) or y["psnr_avg"] == float("inf")


def test_evaluate_dataset_groups_and_avg(tmp_path):
    from tests.test_data import make_clip_tree
    from dynavsr_tpu.data.datasets import VideoTestDataset

    make_clip_tree(str(tmp_path / "GT"), ["a", "b"], frames=4, h=16, w=16)
    make_clip_tree(str(tmp_path / "LQ"), ["a", "b"], frames=4, h=4, w=4)
    ds = VideoTestDataset({
        "dataroot_GT": str(tmp_path / "GT"), "dataroot_LQ": str(tmp_path / "LQ"),
        "N_frames": 3, "scale": 4,
    })
    results = evaluate_dataset(_upscale4, ds, n_frames=3)
    assert set(results) == {"a", "b", "_avg"}
    assert np.isfinite(results["_avg"]["psnr_avg"])


def test_vimeo_t_center_only_protocol(tmp_path):
    from tests.test_data import make_clip_tree
    from dynavsr_tpu.data.loader import create_dataset

    make_clip_tree(str(tmp_path / "GT"), ["s1", "s2", "s3"], frames=7, h=16, w=16)
    make_clip_tree(str(tmp_path / "LQ"), ["s1", "s2", "s3"], frames=7, h=4, w=4)
    ds = create_dataset({
        "mode": "Vimeo90K_test",
        "dataroot_GT": str(tmp_path / "GT"), "dataroot_LQ": str(tmp_path / "LQ"),
        "N_frames": 7, "scale": 4,
    })
    assert len(ds) == 3  # one item per septuplet
    assert ds[0]["LQs"].shape == (7, 4, 4, 3)
    results = evaluate_dataset(_upscale4, ds, n_frames=7, chunk=2)
    assert set(results) == {"s1", "s2", "s3", "_avg"}
    assert results["s1"]["frames"] == 1  # center frame only


def test_tile_plan_coverage_and_margins():
    """Cores are contiguous, disjoint, cover [0, d), and every core pixel
    sits >= overlap from any interior tile edge."""
    from dynavsr_tpu.eval.tiled import tile_plan

    for d, t, ov in [(32, 28, 12), (100, 40, 8), (37, 16, 3), (16, 16, 4),
                     (10, 64, 8), (41, 17, 0)]:
        starts, cores = tile_plan(d, t, ov)
        prev_end = 0
        for s, (a, b) in zip(starts, cores):
            assert 0 <= a < b <= min(t, d)
            assert s + a == prev_end  # contiguous in frame coords
            prev_end = s + b
            if s > 0:
                assert a >= ov  # margin from the leading tile edge
            if s + min(t, d) < d:
                assert min(t, d) - b >= ov  # margin from the trailing edge
        assert prev_end == d
    import pytest

    with pytest.raises(ValueError):
        tile_plan(32, 8, 4)  # 2*ov >= tile


def test_tiled_apply_exact_vs_full():
    """Tiled forward == whole-frame forward when overlap >= the receptive
    field radius (toy 2x 3x3 conv net, RF radius 2), and the wrapper is a
    passthrough when the frame fits one tile."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dynavsr_tpu.eval.tiled import make_tiled_apply

    rng = np.random.default_rng(3)
    k1 = jnp.asarray(rng.standard_normal((3, 3, 3, 8)).astype(np.float32) * 0.3)
    k2 = jnp.asarray(rng.standard_normal((3, 3, 8, 3)).astype(np.float32) * 0.3)

    def apply(params, x):  # (F, N, h, w, 3) -> (F, 2h, 2w, 3), RF radius 2
        y = x[:, x.shape[1] // 2]
        for k in params:
            y = jax.lax.conv_general_dilated(
                y, k, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.repeat(jnp.repeat(y, 2, axis=-3), 2, axis=-2)

    x = jnp.asarray(rng.standard_normal((3, 5, 33, 41, 3)).astype(np.float32))
    full = apply((k1, k2), x)
    for tile, ov in [((16, 16), 4), ((20, 12), 5), ((33, 16), 7)]:
        tiled = make_tiled_apply(apply, tile, ov, scale=2)((k1, k2), x)
        np.testing.assert_allclose(np.asarray(tiled), np.asarray(full),
                                   atol=1e-5, rtol=1e-5)
    # single-tile passthrough
    same = make_tiled_apply(apply, (64, 64), 8, scale=2)((k1, k2), x)
    np.testing.assert_allclose(np.asarray(same), np.asarray(full), atol=0)


@pytest.mark.slow
def test_tiled_apply_real_model_duf():
    """End-to-end on a real backbone: DUF-16L (receptive-field radius ~10)
    tiled with overlap 12 matches the whole-frame forward."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dynavsr_tpu.eval.tiled import make_tiled_apply
    from dynavsr_tpu.models.duf import DUF

    model = DUF(scale=4, dense1_layers=3)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 7, 32, 36, 3))
    params = model.init(jax.random.PRNGKey(1), x)
    apply = lambda p, v: model.apply(p, v)  # noqa: E731
    full = apply(params, x)
    tiled = make_tiled_apply(apply, (28, 28), 12, scale=4)(params, x)
    assert tiled.shape == full.shape == (1, 128, 144, 3)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(full),
                               atol=2e-5, rtol=1e-5)
