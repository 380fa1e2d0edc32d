"""Dynamic per-pixel filtering (DUF's upsampling mechanism).

Reference `DynFilter3D` (utils.py:330-348) expands each pixel's 1x5x5
neighbourhood with a *constant identity conv kernel stored as a variable*
and then matmuls with the predicted filters.  Here the identity expansion is
a constant (never a parameter) and the per-pixel matmul is an einsum that
XLA batches onto the MXU.  Note: TF1 checkpoints contain that constant as
`DynFilter3D/filter_localexpand`; importers must skip/inject it.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


@functools.lru_cache(maxsize=8)
def _identity_expand_kernel(ft: int, fh: int, fw: int) -> np.ndarray:
    """[fh, fw, ft, ft*fh*fw] kernel: output channel k picks the input value
    at window offset k (row-major over (i, j)), matching the reference's
    np.eye reshape (utils.py:339)."""
    n = ft * fh * fw
    return np.reshape(np.eye(n, n, dtype=np.float32), (fh, fw, ft, n))


def dyn_filter_3d(x: jax.Array, filters: jax.Array, filter_size=(1, 5, 5)) -> jax.Array:
    """x: [B, T, H, W] (T = filter_size[0], usually 1 — the center frame),
    filters: [B, H, W, T*fh*fw, R*R] softmaxed filter bank.
    Returns [B, H, W, R*R] (reference utils.py:330-348)."""
    ft, fh, fw = filter_size
    x = jnp.transpose(x, (0, 2, 3, 1))  # [B,H,W,T]
    kernel = jnp.asarray(_identity_expand_kernel(ft, fh, fw), x.dtype)
    patches = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # [B,H,W,T*fh*fw], zero-padded borders like the reference's SAME conv
    return jnp.einsum("bhwp,bhwpr->bhwr", patches, filters)
