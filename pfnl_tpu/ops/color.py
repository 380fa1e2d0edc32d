"""BT.601 studio-swing color conversions on [0,1] floats.

Constants match the reference exactly (modules/videosr_ops.py:71-137), and
`rgb2ycbcr_np` matches the numpy/MATLAB metric path (utils.py:194-212),
which is what the published PSNR tables are computed with.

These are elementwise reductions over the trailing channel axis; they work
for any leading rank ([H,W,3], [N,H,W,3], [N,T,H,W,3], ...).
"""

import numpy as np
import jax
import jax.numpy as jnp

_Y_SCALE = np.array([65.481, 128.553, 24.966], np.float32) / 255.0
_YCBCR_T = (
    np.array(
        [[65.481, 128.553, 24.966], [-37.797, -74.203, 112.0], [112.0, -93.786, -18.214]],
        np.float32,
    )
    / 255.0
)
_YCBCR_OFFSET = np.array([16.0, 128.0, 128.0], np.float32) / 255.0
# Reference hard-codes this (truncated) inverse (modules/videosr_ops.py:112).
_YCBCR_TINV = (
    np.array(
        [
            [0.00456621, 0.0, 0.00625893],
            [0.00456621, -0.00153632, -0.00318811],
            [0.00456621, 0.00791071, 0.0],
        ],
        np.float32,
    )
    * 255.0
)
_GRAY_SCALE = np.array([0.299, 0.587, 0.114], np.float32)


def rgb2y(x: jax.Array) -> jax.Array:
    """[..., 3] RGB -> [..., 1] Y (reference modules/videosr_ops.py:71-83).
    Passes single-channel input through unchanged."""
    if x.shape[-1] == 1:
        return x
    return jnp.sum(x * jnp.asarray(_Y_SCALE, x.dtype), axis=-1, keepdims=True) + jnp.asarray(
        16.0 / 255.0, x.dtype
    )


def rgb2ycbcr(x: jax.Array) -> jax.Array:
    """[..., 3] RGB -> [..., 3] YCbCr (reference modules/videosr_ops.py:86-101)."""
    if x.shape[-1] == 1:
        return x
    t = jnp.asarray(_YCBCR_T, x.dtype)
    off = jnp.asarray(_YCBCR_OFFSET, x.dtype)
    return jnp.einsum("...c,kc->...k", x, t) + off


def ycbcr2rgb(x: jax.Array) -> jax.Array:
    """[..., 3] YCbCr -> [..., 3] RGB (reference modules/videosr_ops.py:104-123)."""
    if x.shape[-1] == 1:
        return x
    tinv = jnp.asarray(_YCBCR_TINV, x.dtype)
    off = jnp.asarray(_YCBCR_OFFSET, x.dtype)
    return jnp.einsum("...c,kc->...k", x - off, tinv)


def rgb2gray(x: jax.Array) -> jax.Array:
    """[..., 3] RGB -> [..., 1] luma, full-swing (reference modules/videosr_ops.py:126-137)."""
    if x.shape[-1] == 1:
        return x
    return jnp.sum(x * jnp.asarray(_GRAY_SCALE, x.dtype), axis=-1, keepdims=True)


def rgb2ycbcr_np(img: np.ndarray, max_val: float = 255.0) -> np.ndarray:
    """Numpy metric-path conversion; `img` in [0,255] (or [0,1] with
    max_val=1).  Bit-matches reference utils.py:194-212 (`_rgb2ycbcr`),
    which itself matches MATLAB's rgb2ycbcr on doubles."""
    T = np.array(
        [
            [0.256788235294118, 0.504129411764706, 0.097905882352941],
            [-0.148223529411765, -0.290992156862745, 0.439215686274510],
            [0.439215686274510, -0.367788235294118, -0.071427450980392],
        ]
    )
    offset = np.array([16.0, 128.0, 128.0])
    if max_val == 1:
        offset = offset / 255.0
    return img @ T.T + offset
