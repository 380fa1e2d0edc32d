"""HR->LR degradation: 13x13 Gaussian blur + stride-`scale` decimation.

This op *defines* the LR domain of the whole framework — training inputs,
eval inputs and test inputs are all produced by it — so it must bit-match
the reference (reference: utils.py:95-105 `gkern`/`BLUR`,
utils.py:142-192 `DownSample`/`DownSample_4D`):

  * kernel: a Dirac delta smoothed by `scipy.ndimage.gaussian_filter`
    (sigma=1.6, 13x13).  With truncate=4.0 (scipy default) the 1-D radius is
    int(4.0*1.6 + 0.5) = 6, exactly the 13-tap support, and the smoothed
    Dirac is the separable outer product of the normalized 1-D Gaussian.
  * REFLECT padding of 6 on each side, then a depthwise (per-channel)
    cross-correlation with stride `scale`, VALID.

TPU notes: the conv is expressed as `lax.conv_general_dilated` with
`feature_group_count=3` (depthwise) in NHWC — XLA lowers this onto the MXU
and fuses the reflect-pad.  The op is jittable and is meant to be run
*inside* the train step so degradation never leaves the device.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def gaussian_kernel_2d(kernlen: int = 13, sigma: float = 1.6) -> np.ndarray:
    """Separable 2-D Gaussian identical to scipy.ndimage.gaussian_filter
    applied to a centered Dirac (reference utils.py:95-102)."""
    radius = kernlen // 2
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    phi = np.exp(-0.5 / (sigma * sigma) * x * x)
    phi /= phi.sum()
    return np.outer(phi, phi).astype(np.float32)


# The canonical x4 blur (reference utils.py:104-105).
BLUR_KERNEL = gaussian_kernel_2d(13, 1.6)


def _depthwise_blur_decimate(x: jax.Array, kernel: jax.Array, scale: int) -> jax.Array:
    """x: [N,H,W,C] -> [N,H//scale,W//scale,C]."""
    k = kernel.shape[0]
    pad = k - 1
    pt, pb = pad // 2, pad - pad // 2
    x = jnp.pad(x, ((0, 0), (pt, pb), (pt, pb), (0, 0)), mode="reflect")
    c = x.shape[-1]
    # depthwise: rhs [kh, kw, in_ch/groups=1, out_ch=C]
    rhs = jnp.tile(kernel.astype(x.dtype)[:, :, None, None], (1, 1, 1, c))
    return lax.conv_general_dilated(
        x,
        rhs,
        window_strides=(scale, scale),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def downsample_4d(x: jax.Array, kernel=None, scale: int = 4) -> jax.Array:
    """[N,H,W,C] Gaussian blur + decimate (reference utils.py:169-192)."""
    if kernel is None:
        kernel = BLUR_KERNEL
    kernel = jnp.asarray(kernel)
    if kernel.ndim == 4:  # accept the reference's [13,13,1,1] layout
        kernel = kernel[:, :, 0, 0]
    return _depthwise_blur_decimate(x, kernel, scale)


def downsample(x: jax.Array, kernel=None, scale: int = 4) -> jax.Array:
    """[N,T,H,W,C] variant: folds T into the batch (reference utils.py:142-167)."""
    n, t, h, w, c = x.shape
    y = downsample_4d(x.reshape(n * t, h, w, c), kernel, scale)
    return y.reshape(n, t, y.shape[1], y.shape[2], c)
