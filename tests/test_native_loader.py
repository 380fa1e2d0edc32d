"""Native C++ PNG loader vs the Python path."""

import numpy as np
import pytest

from pfnl_tpu import native
from pfnl_tpu.utils.image_io import imread, imsave


@pytest.fixture(scope="module")
def pngs(tmp_path_factory):
    root = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(4):
        img = (rng.random((24, 30, 3)) * 255).astype(np.uint8)
        p = str(root / f"img_{i}.png")
        imsave(p, img)
        paths.append(p)
    return paths


def test_native_available():
    assert native.available(), "native loader failed to compile/load"


def test_png_size(pngs):
    assert native.png_size(pngs[0]) == (24, 30)


def test_decode_full_matches_python(pngs):
    got = native.decode_crop_batch(pngs, threads=2)
    assert got.shape == (4, 24, 30, 3)
    for i, p in enumerate(pngs):
        np.testing.assert_array_equal(got[i], imread(p))


def test_decode_crop_matches_python(pngs):
    y0 = [0, 2, 5, 1]
    x0 = [3, 0, 7, 2]
    got = native.decode_crop_batch(pngs, y0, x0, crop_hw=(10, 12), threads=2)
    assert got.shape == (4, 10, 12, 3)
    for i, p in enumerate(pngs):
        ref = imread(p)[y0[i] : y0[i] + 10, x0[i] : x0[i] + 12]
        np.testing.assert_array_equal(got[i], ref)


def test_encode_roundtrip(pngs, tmp_path):
    rng = np.random.default_rng(1)
    img = (rng.random((16, 20, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "out.png")
    native.encode_png(p, img)
    np.testing.assert_array_equal(imread(p), img)
