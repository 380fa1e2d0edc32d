"""Shared helpers for the Pallas TPU kernels."""

import jax
import jax.numpy as jnp


def _lrelu(x, alpha=0.2):
    return jnp.maximum(x, alpha * x)


def _prec(dtype):
    """f32 operands need an explicit HIGHEST or Mosaic lowers the dot to a
    single bf16 pass (~1e-3 rel error; measured)."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


def _round_up(x, m):
    return -(-x // m) * m
