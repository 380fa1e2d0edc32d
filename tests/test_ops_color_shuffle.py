"""Golden tests for color conversions and pixel-shuffle layouts."""

import numpy as np
import pytest

from pfnl_tpu.ops.color import rgb2y, rgb2ycbcr, ycbcr2rgb, rgb2gray, rgb2ycbcr_np
from pfnl_tpu.ops.shuffle import (
    depth_to_space,
    space_to_depth,
    depth_to_space_3d,
    pixel_shuffle_legacy,
    zero_upsampling,
)

pytestmark = pytest.mark.quick


def test_rgb2y_constants(rng):
    x = rng.random((2, 4, 5, 3)).astype(np.float32)
    got = np.asarray(rgb2y(x))
    ref = (x * (np.array([65.481, 128.553, 24.966]) / 255.0)).sum(-1, keepdims=True) + 16 / 255.0
    np.testing.assert_allclose(got, ref, atol=1e-6)
    # single-channel passthrough
    y = rng.random((2, 4, 5, 1)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(rgb2y(y)), y)


def test_ycbcr_roundtrip(rng):
    x = rng.random((3, 8, 8, 3)).astype(np.float32) * 0.8 + 0.1
    ycc = np.asarray(rgb2ycbcr(x))
    back = np.asarray(ycbcr2rgb(ycc))
    # reference uses a truncated inverse matrix -> ~1e-3 roundtrip accuracy
    np.testing.assert_allclose(back, x, atol=5e-3)


def test_rgb2ycbcr_matches_numpy_metric_path(rng):
    x = rng.random((4, 5, 3)).astype(np.float32)
    jax_ycc = np.asarray(rgb2ycbcr(x))
    np_ycc = rgb2ycbcr_np(x * 255.0, max_val=255) / 255.0
    np.testing.assert_allclose(jax_ycc, np_ycc, atol=2e-4)


def test_rgb2gray(rng):
    x = rng.random((2, 4, 4, 3)).astype(np.float32)
    ref = (x * np.array([0.299, 0.587, 0.114])).sum(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(rgb2gray(x)), ref, atol=1e-6)


def test_depth_to_space_tf_semantics():
    # out[n, h*r+dy, w*r+dx, c] = in[n, h, w, (dy*r+dx)*C + c]
    n, h, w, c, r = 1, 2, 3, 2, 2
    x = np.arange(n * h * w * c * r * r, dtype=np.float32).reshape(n, h, w, c * r * r)
    got = np.asarray(depth_to_space(x, r))
    ref = np.zeros((n, h * r, w * r, c), np.float32)
    for hh in range(h):
        for ww in range(w):
            for dy in range(r):
                for dx in range(r):
                    for ch in range(c):
                        ref[0, hh * r + dy, ww * r + dx, ch] = x[0, hh, ww, (dy * r + dx) * c + ch]
    np.testing.assert_array_equal(got, ref)


def test_space_to_depth_inverse(rng):
    x = rng.random((2, 4, 6, 8)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(space_to_depth(depth_to_space(x, 2), 2)), x)


def test_depth_to_space_3d(rng):
    x = rng.random((2, 3, 2, 2, 16)).astype(np.float32)
    got = np.asarray(depth_to_space_3d(x, 4))
    assert got.shape == (2, 3, 8, 8, 1)
    per_frame = np.asarray(depth_to_space(x[:, 1], 4))
    np.testing.assert_array_equal(got[:, 1], per_frame)


def test_pixel_shuffle_legacy_matches_reference_layout():
    """Oracle: a literal numpy transcription of modules/ps.py:3-15."""
    n, h, w, r, n_out = 2, 3, 4, 2, 2
    x = np.arange(n * h * w * r * r * n_out, dtype=np.float32).reshape(n, h, w, r * r * n_out)
    parts = np.split(x, r, axis=3)
    xr = np.concatenate(parts, axis=2)
    ref = xr.reshape(n, r * h, r * w, n_out)
    np.testing.assert_array_equal(np.asarray(pixel_shuffle_legacy(x, r, n_out)), ref)


def test_pixel_shuffle_legacy_equals_d2s(rng):
    """The split/concat/reshape dance of modules/ps.py is algebraically
    identical to tf.depth_to_space (verified against the transcription
    oracle above); we rely on that equivalence."""
    x = rng.random((2, 3, 4, 8)).astype(np.float32)
    a = np.asarray(pixel_shuffle_legacy(x, 2, 2))
    b = np.asarray(depth_to_space(x, 2))
    np.testing.assert_array_equal(a, b)


def test_zero_upsampling(rng):
    x = rng.random((1, 2, 3, 2)).astype(np.float32)
    y = np.asarray(zero_upsampling(x, 2))
    assert y.shape == (1, 4, 6, 2)
    np.testing.assert_array_equal(y[:, ::2, ::2], x)
    assert np.sum(y != 0) == x.size  # all other positions are zero


def test_channel2sub_roundtrip(rng):
    from pfnl_tpu.ops.shuffle import channel2sub, sub2channel

    x = rng.random((2, 3, 4, 12)).astype(np.float32)
    up = np.asarray(channel2sub(x, 2))
    assert up.shape == (2, 6, 8, 3)
    np.testing.assert_array_equal(np.asarray(sub2channel(up, 2)), x)
    # 5-D variant
    x5 = rng.random((1, 2, 3, 4, 12)).astype(np.float32)
    up5 = np.asarray(channel2sub(x5, 2))
    assert up5.shape == (1, 2, 6, 8, 3)
