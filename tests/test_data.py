"""Data-layer tests on synthetic PNG fixtures (no benchmark datasets in CI)."""

import os

import numpy as np
import pytest

from fldrx.config import papermodel
from fldrx.data.datasets import (Inter4KTest, TEST_MULTIPLES, XTest, XTrain,
                                 XiphTest, frames_to_tensor, imread_bgr,
                                 make_x_test_items)
from fldrx.data.loader import PrefetchLoader, train_batches


def _write_png(path, arr):
    from PIL import Image
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


@pytest.fixture(scope="module")
def x_layout(tmp_path_factory):
    """XVFI layout: root/type/scene/0000.png..0032.png (33 frames)."""
    root = tmp_path_factory.mktemp("xtest")
    rng = np.random.RandomState(0)
    for tdir in ("Type1",):
        for scene in ("TEST01", "TEST02"):
            for i in range(33):
                arr = rng.randint(0, 255, (64, 96, 3), np.uint8)
                _write_png(str(root / tdir / scene / f"{i:04d}.png"), arr)
    return str(root)


def test_imread_bgr_channel_order(tmp_path):
    arr = np.zeros((4, 4, 3), np.uint8)
    arr[..., 0] = 255                      # pure red in RGB
    p = str(tmp_path / "red.png")
    _write_png(p, arr)
    bgr = imread_bgr(p)
    assert bgr[0, 0, 2] == 255 and bgr[0, 0, 0] == 0   # red in BGR slot 2


def test_frames_to_tensor_range():
    x = np.array([[[[0, 128, 255]]]], np.uint8)
    t = frames_to_tensor(x)
    np.testing.assert_allclose(t.ravel(), [-1.0, 128 / 255 * 2 - 1, 1.0],
                               atol=1e-6)


def test_x_test_indexing(x_layout):
    items = make_x_test_items(x_layout, multiple=8)
    # 2 scenes × 1 window × 7 targets
    assert len(items) == 14
    first = items[0]
    assert first.paths[0].endswith("0000.png")
    assert first.paths[1].endswith("0032.png")
    assert first.paths[2].endswith("0004.png")        # 32//8 * 1
    assert abs(first.t - 1 / 8) < 1e-9
    # multiple=2: single midpoint target
    items2 = make_x_test_items(x_layout, multiple=2)
    assert len(items2) == 2
    assert items2[0].paths[2].endswith("0016.png")
    assert items2[0].t == 0.5


def test_x_test_dataset_load(x_layout):
    cfg = papermodel().replace(x_test_data_path=x_layout, test_patch_size=-1)
    ds = XTest(cfg, multiple=8, validation=False)
    frames, t, scene = ds.load(0)
    assert frames.shape == (3, 64, 96, 3)
    assert frames.dtype == np.float32
    assert -1.0 <= frames.min() and frames.max() <= 1.0


def test_x_train_sampling(x_layout, tmp_path):
    # X-Train needs 65-frame clips: synthesize one scene/sample with 65 frames
    root = str(tmp_path / "xtrain")
    rng = np.random.RandomState(1)
    for i in range(65):
        _write_png(os.path.join(root, "s1", "clip1", f"{i:04d}.png"),
                   rng.randint(0, 255, (96, 128, 3), np.uint8))
    cfg = papermodel().replace(x_train_data_path=root, patch_size=64)
    ds = XTrain(cfg)
    assert len(ds) == 1
    import random
    frames, t = ds.sample(0, random.Random(0))
    assert frames.shape == (3, 64, 64, 3)
    assert 0.0 < t < 1.0

    batches = list(train_batches(ds, batch_size=1, seed=0, epoch=0))
    assert batches[0]["frames"].shape == (1, 2, 64, 64, 3)
    assert batches[0]["target"].shape == (1, 64, 64, 3)
    assert batches[0]["t"].shape == (1, 1)


def test_inter4k_indexing(tmp_path):
    root = str(tmp_path / "inter4k")
    rng = np.random.RandomState(2)
    for i in range(17):
        _write_png(os.path.join(root, "scene_a", f"im{i:03d}.png"),
                   rng.randint(0, 255, (32, 48, 3), np.uint8))
    cfg = papermodel().replace(inter4k_data_path=root)
    ds_s = Inter4KTest(cfg, scenerange=8)
    ds_l = Inter4KTest(cfg, scenerange=16)
    assert len(ds_s) == 14                 # 2 windows × 7
    assert len(ds_l) == 7                  # 1 window × 7
    # L-range: step 2 between target frames
    assert ds_l.items[0].paths[2].endswith("im002.png")
    assert ds_s.items[0].paths[2].endswith("im001.png")


def test_prefetch_loader_order_and_completeness():
    seen = []
    loader = PrefetchLoader(lambda i: i * i, 20, num_threads=4, prefetch=2)
    for v in loader:
        seen.append(v)
    assert seen == [i * i for i in range(20)]


def test_test_multiples_table():
    assert TEST_MULTIPLES["X4K1000FPS"] == 8
    assert TEST_MULTIPLES["Xiph-4K"] == 2
    assert TEST_MULTIPLES["Inter4K-S"] == 8


def test_half_res_matches_torch():
    import torch
    import torch.nn.functional as F
    from fldrx.data.datasets import half_res_bilinear
    rng = np.random.RandomState(9)
    frames = rng.rand(2, 32, 48, 3).astype(np.float32)
    got = half_res_bilinear(frames)
    ref = F.interpolate(torch.from_numpy(np.transpose(frames, (0, 3, 1, 2))),
                        scale_factor=0.5, mode="bilinear",
                        align_corners=False).numpy()
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), ref,
                               rtol=1e-4, atol=1e-5)


def test_inter4k_train_dataset(tmp_path):
    """Inter4K train clips: 65 frame DIRECTORIES each holding im{1k,2k,4k}
    resolution variants (utils.py:269-323); random-resolution triplet
    sampling with the XTrain augmentation recipe."""
    import random
    from fldrx.config import papermodel
    from fldrx.data.datasets import Inter4KTrain

    rng0 = np.random.RandomState(0)
    root = tmp_path / "i4k"
    for scene in ("s1",):
        for sample in ("c1",):
            for i in range(65):
                d = root / scene / sample / f"{i:04d}"
                d.mkdir(parents=True)
                for res, sz in (("im1k", 40), ("im2k", 48), ("im4k", 64)):
                    _write_png(str(d / f"{res}.png"),
                               rng0.randint(0, 255, (sz, sz, 3), np.uint8))
    cfg = papermodel().replace(inter4k_data_path=str(root), patch_size=32)
    ds = Inter4KTrain(cfg)
    assert len(ds) == 1
    frames, t = ds.sample(0, random.Random(3))
    assert frames.shape == (3, 32, 32, 3)
    assert 0.0 < t < 1.0
    assert frames.min() >= -1.0 and frames.max() <= 1.0


def test_decode_cache_avoids_pair_redecodes(x_layout, monkeypatch):
    """×N items share I0/I1: the LRU must serve repeats without re-decoding,
    and must return byte-identical frames."""
    from fldrx.data import datasets as D

    calls = []
    real = D.imread_bgr

    def counting(p):
        calls.append(p)
        return real(p)

    monkeypatch.setattr(D, "imread_bgr", counting)
    import fldrx.data.native as N
    monkeypatch.setattr(N, "decode_png_batch_bgr", lambda paths, threads=3:
                        None)                       # force the PIL path
    D._DECODE_CACHE.clear()
    cfg = papermodel().replace(x_test_data_path=x_layout)
    ds = XTest(cfg, multiple=8, validation=False)
    # first item of a pair: 3 decodes; the next 6 items re-use I0/I1
    f0, _, _ = ds.load(0)
    n0 = len(calls)
    assert n0 == 3
    for i in range(1, 7):
        ds.load(i)
    assert len(calls) == n0 + 6        # one NEW target frame per item
    # identical bytes through the cache
    f0b, _, _ = ds.load(0)
    np.testing.assert_array_equal(f0, f0b)
    D._DECODE_CACHE.clear()
