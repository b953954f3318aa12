"""Eval harness tests: batched clip evaluation, metric conventions."""

import numpy as np

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
