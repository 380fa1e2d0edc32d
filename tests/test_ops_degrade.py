"""Golden tests for the degradation kernel — the op everything downstream
depends on (SURVEY.md §7 build order #1).  Oracles: scipy for the Gaussian,
torch's reflect-pad + grouped conv for the depthwise decimation."""

import numpy as np
import pytest

from pfnl_tpu.ops.degrade import gaussian_kernel_2d, BLUR_KERNEL, downsample, downsample_4d

pytestmark = pytest.mark.quick


def test_gkern_matches_scipy():
    import scipy.ndimage as ndi

    inp = np.zeros((13, 13))
    inp[6, 6] = 1
    ref = ndi.gaussian_filter(inp, 1.6)  # reference utils.py:95-102
    np.testing.assert_allclose(gaussian_kernel_2d(13, 1.6), ref, atol=1e-7)
    assert BLUR_KERNEL.dtype == np.float32
    np.testing.assert_allclose(BLUR_KERNEL.sum(), 1.0, atol=1e-6)


def test_downsample_matches_torch_reference(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    x = rng.random((2, 24, 28, 3)).astype(np.float32)
    got = np.asarray(downsample_4d(x, scale=4))

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))  # NCHW
    xt = F.pad(xt, (6, 6, 6, 6), mode="reflect")
    k = torch.from_numpy(BLUR_KERNEL.copy())[None, None].repeat(3, 1, 1, 1)
    ref = F.conv2d(xt, k, stride=4, groups=3).numpy().transpose(0, 2, 3, 1)

    assert got.shape == (2, 6, 7, 3)
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_downsample_5d_folds_time(rng):
    x = rng.random((2, 3, 16, 16, 3)).astype(np.float32)
    y5 = np.asarray(downsample(x, scale=4))
    y4 = np.asarray(downsample_4d(x.reshape(6, 16, 16, 3), scale=4))
    assert y5.shape == (2, 3, 4, 4, 3)
    np.testing.assert_array_equal(y5.reshape(6, 4, 4, 3), y4)


def test_downsample_scale2(rng):
    x = rng.random((1, 16, 16, 3)).astype(np.float32)
    y = np.asarray(downsample_4d(x, scale=2))
    assert y.shape == (1, 8, 8, 3)
