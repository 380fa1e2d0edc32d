"""Quality metrics — BOTH metric families of the reference (SURVEY.md §6):

  * training-log PSNR: 10*log10(1/mse) on RGB floats (model/pfnl.py:139);
  * parity-table metrics: MATLAB-equivalent Y-channel PSNR on uint8 PNGs
    (matlab/compute_psnr.m via utils.py:194-212 rgb2ycbcr) and Wang SSIM
    with an 11x11 sigma=1.5 Gaussian window (modules/SSIM_Index.py:24-89,
    matlab/SSIM.m).

The two PSNRs are different quantities; parity claims always use the
MATLAB-equivalent path on saved PNGs.
"""

import numpy as np

from pfnl_tpu.ops.color import rgb2ycbcr_np


def psnr_from_mse(mse: np.ndarray) -> np.ndarray:
    """Training-log PSNR on [0,1] RGB mse (model/pfnl.py:139)."""
    return 10.0 * np.log10(1.0 / mse)


def _to_y(img: np.ndarray) -> np.ndarray:
    """uint8 (or [0,255] float) RGB -> Y channel double."""
    img = np.asarray(img, np.float64)
    if img.ndim == 3 and img.shape[-1] == 3:
        return rgb2ycbcr_np(img, 255)[..., 0]
    return np.squeeze(img)


def psnr_y_matlab(img1: np.ndarray, img2: np.ndarray) -> float:
    """matlab/compute_psnr.m: Y-channel PSNR on uint8 images."""
    y1, y2 = _to_y(img1), _to_y(img2)
    rmse = np.sqrt(np.mean((y1 - y2) ** 2))
    if rmse == 0:
        return float("inf")
    return float(20.0 * np.log10(255.0 / rmse))


def _gauss2d(shape=(11, 11), sigma=1.5) -> np.ndarray:
    """MATLAB fspecial('gaussian') (modules/SSIM_Index.py:92-105)."""
    m, n = [(s - 1.0) / 2.0 for s in shape]
    y, x = np.ogrid[-m : m + 1, -n : n + 1]
    h = np.exp(-(x * x + y * y) / (2.0 * sigma * sigma))
    h[h < np.finfo(h.dtype).eps * h.max()] = 0
    s = h.sum()
    if s != 0:
        h /= s
    return h


def compute_ssim(im1: np.ndarray, im2: np.ndarray, l: float = 255.0) -> float:
    """Wang-SSIM, transcribing modules/SSIM_Index.py:24-89 (scipy reflect-
    boundary convolution; used by the VESPCN-family evaluation on Y)."""
    import scipy.ndimage as ndi

    c1 = (0.01 * l) ** 2
    c2 = (0.03 * l) ** 2
    window = _gauss2d((11, 11), 1.5)
    im1 = im1.astype(np.float64)
    im2 = im2.astype(np.float64)
    mu1 = ndi.convolve(im1, window)
    mu2 = ndi.convolve(im2, window)
    mu1_sq, mu2_sq, mu12 = mu1**2, mu2**2, mu1 * mu2
    s1 = ndi.convolve(im1 * im1, window) - mu1_sq
    s2 = ndi.convolve(im2 * im2, window) - mu2_sq
    s12 = ndi.convolve(im1 * im2, window) - mu12
    ssim_map = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return float(np.mean(ssim_map))


def ssim_y_matlab(img1: np.ndarray, img2: np.ndarray) -> float:
    """Parity-table SSIM: Y channel of uint8 RGB images, L=255."""
    return compute_ssim(_to_y(img1), _to_y(img2), l=255.0)


def compute_ssim_batch(im1, im2, l: float = 1.0):
    """Batched on-device Wang-SSIM over [..., H, W] image stacks.

    Same window/formula/boundary as `compute_ssim` (scipy.ndimage
    'reflect' == symmetric padding; the Gaussian window is symmetric so
    correlation == convolution), computed in float32 on the accelerator
    as ONE jitted call instead of a serialized host loop per frame —
    the eval-time path (eval/evaluator.py); offline parity tables keep
    the float64 host implementation."""
    import jax
    import jax.numpy as jnp

    im1 = jnp.asarray(im1)
    lead = im1.shape[:-2]
    h, w = im1.shape[-2:]
    global _SSIM_BATCH_JIT
    if _SSIM_BATCH_JIT is None:
        _SSIM_BATCH_JIT = jax.jit(_ssim_batch_impl, static_argnums=(2,))
    flat = _SSIM_BATCH_JIT(
        jnp.reshape(im1, (-1, h, w)), jnp.reshape(jnp.asarray(im2), (-1, h, w)), l
    )
    return jnp.reshape(flat, lead)


_SSIM_BATCH_JIT = None


def _ssim_batch_impl(im1, im2, l):
    import jax
    import jax.numpy as jnp

    h, w = im1.shape[-2:]
    x = jnp.reshape(im1, (-1, h, w, 1)).astype(jnp.float32)
    y = jnp.reshape(im2, (-1, h, w, 1)).astype(jnp.float32)

    window = jnp.asarray(_gauss2d((11, 11), 1.5), jnp.float32)[:, :, None, None]
    pad = lambda v: jnp.pad(v, ((0, 0), (5, 5), (5, 5), (0, 0)), mode="symmetric")
    conv = lambda v: jax.lax.conv_general_dilated(
        pad(v), window, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )

    c1 = (0.01 * l) ** 2
    c2 = (0.03 * l) ** 2
    mu1, mu2 = conv(x), conv(y)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = conv(x * x) - mu1_sq
    s2 = conv(y * y) - mu2_sq
    s12 = conv(x * y) - mu12
    ssim_map = ((2 * mu12 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return jnp.mean(ssim_map, axis=(1, 2, 3))


def avg_psnr(
    vid_true: np.ndarray,
    vid_pred: np.ndarray,
    vmin: float = 0,
    vmax: float = 255,
    t_border: int = 2,
    sp_border: int = 8,
) -> float:
    """Video Y-PSNR with temporal/spatial borders (reference utils.py:219-246)."""
    def to_uint8(x):
        x = (x.astype(np.float64) - vmin) / (vmax - vmin) * 255
        return np.clip(np.round(x), 0, 255)

    y_true = np.stack([_to_y(to_uint8(f)) for f in vid_true])
    y_pred = np.stack([_to_y(to_uint8(f)) for f in vid_pred])
    diff = y_true - y_pred
    diff = diff[t_border : diff.shape[0] - t_border,
                sp_border : diff.shape[1] - sp_border,
                sp_border : diff.shape[2] - sp_border]
    psnrs = [20 * np.log10(255.0 / np.sqrt(np.mean(d**2))) for d in diff]
    return float(np.mean(psnrs))
