"""Loss primitives matching the reference's numerics.

  * charbonnier: mean(sqrt((x-y)^2 + eps)), eps=1e-6 — PFNL's training loss
    (model/pfnl.py:89) and the VESPCN-family per-element "mse"
    (model/vespcn.py:116).
  * huber: the delta-Huber with gradient-safe linear term
    (reference utils.py:350-360), DUF's loss (model/dufvsr.py:65).
  * total_variation: sum over images of abs row/col diffs, matching
    tf.image.total_variation (used in the flow loss,
    model/vespcn.py:126, modules/model_easyflow.py:124).
"""

import jax
import jax.numpy as jnp


def charbonnier(pred: jax.Array, target: jax.Array, eps: float = 1e-6, axis=None) -> jax.Array:
    return jnp.mean(jnp.sqrt((pred - target) ** 2 + eps), axis=axis)


def huber(y_true: jax.Array, y_pred: jax.Array, delta: float, axis=None) -> jax.Array:
    abs_error = jnp.abs(y_pred - y_true)
    quadratic = jnp.minimum(abs_error, delta)
    linear = abs_error - quadratic
    return jnp.mean(0.5 * quadratic**2 + delta * linear, axis=axis)


def total_variation(images: jax.Array) -> jax.Array:
    """images: [N,H,W,C] -> scalar sum over the batch (TF semantics)."""
    dh = jnp.abs(images[:, 1:, :, :] - images[:, :-1, :, :])
    dw = jnp.abs(images[:, :, 1:, :] - images[:, :, :-1, :])
    return jnp.sum(dh) + jnp.sum(dw)
