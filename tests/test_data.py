"""Data layer tests: IO, datasets, loader (synthetic PNG clip trees)."""

import os

import numpy as np
import pytest

from dynavsr_tpu.data.datasets import (
    REDS4_CLIPS,
    MetaVideoDataset,
    REDSDataset,
    VideoTestDataset,
)
from dynavsr_tpu.data.io import glob_clip_folders, read_img
from dynavsr_tpu.data.loader import PrefetchLoader, create_dataloader, create_dataset


def make_clip_tree(root, clips, frames, h, w, seed=0):
    import cv2

    rng = np.random.default_rng(seed)
    for c in clips:
        d = os.path.join(root, c)
        os.makedirs(d, exist_ok=True)
        for i in range(frames):
            img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            cv2.imwrite(os.path.join(d, f"{i:08d}.png"), img)


@pytest.fixture
def video_tree(tmp_path):
    scale = 4
    gt = tmp_path / "GT"
    lq = tmp_path / "LQ"
    clips = ["000", "001", "011", "clipA"]
    make_clip_tree(str(gt), clips, frames=10, h=64, w=48)
    make_clip_tree(str(lq), clips, frames=10, h=64 // scale, w=48 // scale)
    return {"gt": str(gt), "lq": str(lq), "clips": clips, "scale": scale}


def test_read_img_and_glob(video_tree):
    clips = glob_clip_folders(video_tree["gt"])
    assert set(clips) == set(video_tree["clips"])
    img = read_img(clips["000"][0])
    assert img.shape == (64, 48, 3) and img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0


def test_reds_dataset_excludes_reds4_and_shapes(video_tree):
    opt = {
        "dataroot_GT": video_tree["gt"],
        "dataroot_LQ": video_tree["lq"],
        "N_frames": 5,
        "LQ_size": 8,
        "scale": 4,
        "phase": "train",
    }
    ds = REDSDataset(opt)
    assert all(n not in REDS4_CLIPS for n in ds.names)
    item = ds[0]
    assert item["LQs"].shape == (5, 8, 8, 3)
    assert item["GT"].shape == (32, 32, 3)
    assert "key" in item


def test_video_test_dataset(video_tree):
    opt = {
        "dataroot_GT": video_tree["gt"],
        "dataroot_LQ": video_tree["lq"],
        "N_frames": 5,
        "padding": "new_info",
        "scale": 4,
        "mode": "video_test",
    }
    ds = create_dataset(opt)
    assert isinstance(ds, VideoTestDataset)
    assert len(ds) == 4 * 10
    first = ds[0]
    assert first["LQs"].shape == (5, 16, 12, 3)
    assert first["border"] == 1
    assert first["GT"].shape == (64, 48, 3)
    mid = ds[5]
    assert mid["border"] == 0
    assert mid["folder"] == "000" and mid["idx"] == "5/10"


def test_meta_dataset(video_tree):
    ds = MetaVideoDataset(
        {"dataroot_GT": video_tree["gt"], "N_frames": 3, "GT_size": 32, "scale": 4}
    )
    item = ds[0]
    assert item["HR"].shape == (3, 32, 32, 3)


def test_loader_batches_and_sharding(video_tree):
    opt = {
        "dataroot_GT": video_tree["gt"],
        "dataroot_LQ": video_tree["lq"],
        "N_frames": 3,
        "LQ_size": 8,
        "scale": 4,
        "phase": "train",
        "mode": "REDS",
        "batch_size": 4,
        "use_shuffle": True,
        "n_workers": 2,
    }
    ds = create_dataset(opt)
    loader = create_dataloader(ds, opt)
    batches = list(iter(loader))
    assert len(batches) == len(loader)
    b = batches[0]
    assert b["LQs"].shape == (4, 3, 8, 8, 3)
    assert b["GT"].shape == (4, 32, 32, 3)

    # process sharding: two processes see disjoint streams
    l0 = PrefetchLoader(ds, 2, seed=1, process_index=0, process_count=2)
    l1 = PrefetchLoader(ds, 2, seed=1, process_index=1, process_count=2)
    i0 = l0._index_stream()
    i1 = l1._index_stream()
    assert len(set(i0.tolist()) & set(i1.tolist())) <= len(i0) // 2  # mostly disjoint
    # deterministic across instances at same epoch
    assert np.array_equal(i0, PrefetchLoader(ds, 2, seed=1, process_count=2)._index_stream())
    l0.set_epoch(1)
    assert not np.array_equal(i0, l0._index_stream())


def test_loader_error_propagation(video_tree):
    class Bad:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise RuntimeError("decode failed")

    loader = PrefetchLoader(Bad(), 2)
    with pytest.raises(RuntimeError, match="decode failed"):
        list(iter(loader))


def test_loader_skip_batches_resume(video_tree):
    opt = {
        "dataroot_GT": video_tree["gt"], "dataroot_LQ": video_tree["lq"],
        "N_frames": 3, "LQ_size": 8, "scale": 4, "phase": "train",
    }
    from dynavsr_tpu.data.datasets import REDSDataset

    ds = REDSDataset(opt)
    full = PrefetchLoader(ds, 2, seed=3)
    keys_full = [b["key"] for b in full]
    resumed = PrefetchLoader(ds, 2, seed=3)
    resumed.set_skip_batches(2)
    keys_resumed = [b["key"] for b in resumed]
    assert len(keys_resumed) == len(keys_full) - 2
    # skip is one-shot: next epoch is complete again
    assert len([b for b in resumed]) == len(keys_full)
