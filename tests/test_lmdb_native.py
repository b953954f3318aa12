"""Native LMDB reader/writer round-trip tests (C++ lib via ctypes)."""

import numpy as np
import pytest

from dynavsr_tpu.data.lmdb_native import LmdbReader, LmdbWriter, build_native


def test_build():
    assert build_native().endswith(".so")


def test_roundtrip_small(tmp_path):
    path = str(tmp_path / "small.lmdb")
    kv = {f"k{i:04d}".encode(): f"value-{i}".encode() * (i + 1) for i in range(50)}
    with LmdbWriter(path) as w:
        for k, v in kv.items():
            w.put(k, v)
    with LmdbReader(path) as r:
        assert len(r) == 50
        for k, v in kv.items():
            assert r.get(k) == v
        assert r.get(b"missing") is None
        items = list(r.items())
        assert [k for k, _ in items] == sorted(kv)  # B+tree order
        assert dict(items) == kv


def test_roundtrip_large_values_multilevel(tmp_path):
    """Values far bigger than a page (like encoded frames) + enough keys to
    force multiple branch levels."""
    rng = np.random.default_rng(0)
    path = str(tmp_path / "big.lmdb")
    kv = {}
    with LmdbWriter(path) as w:
        for i in range(2000):
            k = f"{i % 7:03d}_{i:08d}".encode()  # REDS-style keys
            v = rng.integers(0, 256, rng.integers(1, 20000), dtype=np.uint8).tobytes()
            kv[k] = v
            w.put(k, v)
    with LmdbReader(path) as r:
        assert len(r) == 2000
        for k in list(kv)[::97]:
            assert r.get(k) == kv[k]
        n = sum(1 for _ in r.items())
        assert n == 2000


def test_image_roundtrip_and_dataset_keys(tmp_path):
    """PNG-encoded frames through LMDB, reference key convention."""
    import cv2

    rng = np.random.default_rng(1)
    path = str(tmp_path / "frames.lmdb")
    imgs = {}
    with LmdbWriter(path) as w:
        for clip in ("000", "001"):
            for i in range(4):
                img = rng.integers(0, 255, (16, 12, 3), dtype=np.uint8)
                ok, buf = cv2.imencode(".png", img)
                assert ok
                key = f"{clip}_{i:08d}".encode()
                imgs[key] = img
                w.put(key, buf.tobytes())
    with LmdbReader(path) as r:
        for key, img in imgs.items():
            dec = cv2.imdecode(
                np.frombuffer(r.get(key), np.uint8), cv2.IMREAD_UNCHANGED
            )
            np.testing.assert_array_equal(dec, img)


def test_empty_db(tmp_path):
    path = str(tmp_path / "empty.lmdb")
    with LmdbWriter(path):
        pass
    with LmdbReader(path) as r:
        assert len(r) == 0
        assert r.get(b"x") is None
        assert list(r.items()) == []


def test_lmdb_backed_dataset_and_scripts(tmp_path):
    """create_lmdb script -> LMDB-backed REDSDataset end-to-end."""
    import sys
    sys.path.insert(0, "data_scripts")
    from tests.test_data import make_clip_tree
    from data_scripts.create_lmdb import main as create_lmdb_main
    from dynavsr_tpu.data.datasets import REDSDataset

    make_clip_tree(str(tmp_path / "GT"), ["007", "008"], frames=6, h=32, w=32)
    make_clip_tree(str(tmp_path / "LQ"), ["007", "008"], frames=6, h=8, w=8)
    gt_lmdb = str(tmp_path / "gt.lmdb")
    lq_lmdb = str(tmp_path / "lq.lmdb")
    create_lmdb_main(["--input", str(tmp_path / "GT"), "--output", gt_lmdb])
    create_lmdb_main(["--input", str(tmp_path / "LQ"), "--output", lq_lmdb])

    ds = REDSDataset({
        "dataroot_GT": gt_lmdb, "dataroot_LQ": lq_lmdb,
        "N_frames": 3, "LQ_size": 8, "scale": 4, "phase": "train",
    })
    item = ds[0]
    assert item["LQs"].shape == (3, 8, 8, 3)
    assert item["GT"].shape == (32, 32, 3)
    # frames identical to the folder-backed read
    ds2 = REDSDataset({
        "dataroot_GT": str(tmp_path / "GT"), "dataroot_LQ": str(tmp_path / "LQ"),
        "N_frames": 3, "LQ_size": 8, "scale": 4, "phase": "train",
    })
    a = ds.lq_index.read("007", 2)
    b = ds2.lq_index.read("007", 2)
    np.testing.assert_array_equal(a, b)


def test_generate_mod_lr_bic_script(tmp_path):
    from tests.test_data import make_clip_tree
    from data_scripts.generate_mod_LR_bic import main as gen_main

    make_clip_tree(str(tmp_path / "GT"), ["c"], frames=2, h=35, w=30)
    gen_main(["--input", str(tmp_path / "GT"), "--output", str(tmp_path / "out"),
              "--scale", "4"])
    import cv2
    gt = cv2.imread(str(tmp_path / "out/GT/c/00000000.png"))
    lr = cv2.imread(str(tmp_path / "out/LRx4/c/00000000.png"))
    assert gt.shape == (32, 28, 3)   # mod-cropped
    assert lr.shape == (8, 7, 3)


def test_writer_rejects_oversized_key(tmp_path):
    """A key whose leaf node exceeds one page must be rejected up front
    (ADVICE.md low: it previously overflowed the page buffer)."""
    import pytest

    from dynavsr_tpu.data.lmdb_native import LmdbWriter

    w = LmdbWriter(str(tmp_path / "big.lmdb"))
    with pytest.raises(ValueError):
        w.put(b"k" * 5000, b"v")
    w.put(b"ok", b"payload")  # normal keys still fine
    w.close()
