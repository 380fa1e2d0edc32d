"""Separable image resize expressed as two small matmuls (MXU-friendly).

The reference upsamples with TF1 `tf.image.resize_images(align_corners=False)`
— bilinear (method=0) and bicubic (method=2) — whose *legacy* coordinate
mapping is `src = dst * in/out` (no half-pixel offset) with a Keys cubic
kernel A=-0.75 and index clamping at the borders
(reference call sites: model/pfnl.py:63, model/vespcn.py:62,
model/ltdvsr.py:112, model/frvsr.py:87,100; 5-D wrapper
modules/videosr_ops.py:60-68).

Instead of gather-based sampling (slow on TPU), we precompute dense 1-D
resampling matrices W_h [H_out, H_in] and W_w [W_out, W_in] at trace time
(shapes are static under jit) and contract:

    y = W_h @ x @ W_w^T        (per batch/channel, via einsum)

which XLA maps straight onto the MXU.  `mapping="half_pixel"` gives the
modern convention for non-parity use.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp


def _keys_cubic(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    x = np.abs(x)
    out = np.where(x <= 1.0, (a + 2.0) * x**3 - (a + 3.0) * x**2 + 1.0, 0.0)
    out = np.where((x > 1.0) & (x < 2.0), a * x**3 - 5.0 * a * x**2 + 8.0 * a * x - 4.0 * a, out)
    return out


def _triangle(x: np.ndarray) -> np.ndarray:
    x = np.abs(x)
    return np.maximum(0.0, 1.0 - x)


@functools.lru_cache(maxsize=256)
def _resize_matrix(n_in: int, n_out: int, method: str, mapping: str) -> np.ndarray:
    """Dense [n_out, n_in] resampling matrix (float32)."""
    if method == "bilinear":
        kernel, support = _triangle, 1
    elif method == "bicubic":
        kernel, support = _keys_cubic, 2
    else:
        raise ValueError(f"unknown resize method: {method}")

    dst = np.arange(n_out, dtype=np.float64)
    scale = n_in / n_out
    if mapping == "tf1":
        src = dst * scale
    elif mapping == "half_pixel":
        src = (dst + 0.5) * scale - 0.5
    elif mapping == "align_corners":
        # TF1 resize_images(align_corners=True) (FlowNet-C pre/post
        # resizes, reference modules/model_flownet.py:252,315)
        src = dst * ((n_in - 1) / max(n_out - 1, 1))
    else:
        raise ValueError(f"unknown coordinate mapping: {mapping}")

    base = np.floor(src).astype(np.int64)
    w = np.zeros((n_out, n_in), dtype=np.float64)
    for tap in range(-support + 1, support + 1):
        idx = base + tap
        weight = kernel(src - idx)
        np.add.at(w, (dst.astype(np.int64), np.clip(idx, 0, n_in - 1)), weight)
    return w.astype(np.float32)


def _apply_separable(x: jax.Array, out_h: int, out_w: int, method: str, mapping: str) -> jax.Array:
    n, h, w, c = x.shape
    dtype = x.dtype
    # bf16 inputs stay bf16 through the resampling matmuls (half the HBM
    # traffic of the big upscaled intermediates); everything else uses f32
    compute = jnp.bfloat16 if dtype == jnp.bfloat16 else jnp.float32
    wh = jnp.asarray(_resize_matrix(h, out_h, method, mapping), compute)
    ww = jnp.asarray(_resize_matrix(w, out_w, method, mapping), compute)
    y = jnp.einsum("oh,nhwc->nowc", wh, x.astype(compute))
    y = jnp.einsum("pw,nowc->nopc", ww, y)
    return y.astype(dtype)


def resize_images(x: jax.Array, size, method: str = "bilinear", mapping: str = "tf1") -> jax.Array:
    """Resize [N,H,W,C] or [N,T,H,W,C] to spatial `size=(H',W')`.

    5-D input folds T into the batch, mirroring the reference's 5-D-aware
    wrapper (modules/videosr_ops.py:60-68)."""
    out_h, out_w = int(size[0]), int(size[1])
    if x.ndim == 5:
        n, t, h, w, c = x.shape
        y = _apply_separable(x.reshape(n * t, h, w, c), out_h, out_w, method, mapping)
        return y.reshape(n, t, out_h, out_w, c)
    if x.ndim == 4:
        return _apply_separable(x, out_h, out_w, method, mapping)
    if x.ndim == 3:
        return _apply_separable(x[None], out_h, out_w, method, mapping)[0]
    raise ValueError(f"resize_images expects rank 3/4/5, got {x.ndim}")


def resize_bilinear(x: jax.Array, size, mapping: str = "tf1") -> jax.Array:
    return resize_images(x, size, "bilinear", mapping)


def resize_bicubic(x: jax.Array, size, mapping: str = "tf1") -> jax.Array:
    return resize_images(x, size, "bicubic", mapping)
