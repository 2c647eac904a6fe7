"""Native C++ PNG decoder: build, decode-parity with PIL, batch threading."""

import os
import time

import numpy as np
import pytest

from fldrx.data.native import decode_png_batch_bgr, get_lib, probe_png
from fldrx.data.datasets import imread_bgr


@pytest.fixture(scope="module")
def pngs(tmp_path_factory):
    from PIL import Image
    d = tmp_path_factory.mktemp("pngs")
    rng = np.random.RandomState(0)
    paths = []
    for i in range(6):
        arr = rng.randint(0, 255, (48, 64, 3), np.uint8)
        p = str(d / f"im{i}.png")
        Image.fromarray(arr).save(p)
        paths.append(p)
    return paths


def test_native_lib_builds():
    lib = get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    assert lib is not None


def test_probe(pngs):
    if get_lib() is None:
        pytest.skip("native decoder unavailable")
    assert probe_png(pngs[0]) == (64, 48)


def test_decode_matches_pil(pngs):
    if get_lib() is None:
        pytest.skip("native decoder unavailable")
    got = decode_png_batch_bgr(pngs, threads=4)
    assert got is not None and got.shape == (6, 48, 64, 3)
    for i, p in enumerate(pngs):
        ref = imread_bgr(p)
        np.testing.assert_array_equal(got[i], ref)


def test_decode_missing_file_falls_back(pngs, tmp_path):
    if get_lib() is None:
        pytest.skip("native decoder unavailable")
    assert decode_png_batch_bgr([pngs[0], str(tmp_path / "nope.png")]) is None


def test_decode_mixed_sizes_rejected(pngs, tmp_path):
    from PIL import Image
    if get_lib() is None:
        pytest.skip("native decoder unavailable")
    other = str(tmp_path / "other.png")
    Image.fromarray(np.zeros((10, 10, 3), np.uint8)).save(other)
    assert decode_png_batch_bgr([pngs[0], other]) is None
