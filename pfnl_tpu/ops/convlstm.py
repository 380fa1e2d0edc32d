"""Convolutional LSTM cell (reference modules/BasicConvLSTMCell.py:41-156).

One fused conv over concat([x, h]) produces the 4 gates in (i, j, f, o)
order; kernel init is truncated-normal sigma=1e-3 with zero bias, matching
the reference (modules/BasicConvLSTMCell.py:130-137).  Designed to be driven
by `jax.lax.scan` (DRVSR encoder) rather than a Python loop.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


class ConvLSTMCell(nn.Module):
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    forget_bias: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, state, x):
        c, h = state
        gates = nn.Conv(
            4 * self.features,
            self.kernel_size,
            padding="SAME",
            kernel_init=nn.initializers.truncated_normal(stddev=1e-3),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="gates",
        )(jnp.concatenate([x, h], axis=-1))
        i, j, f, o = jnp.split(gates, 4, axis=-1)
        new_c = c * jax.nn.sigmoid(f + self.forget_bias) + jax.nn.sigmoid(i) * jnp.tanh(j)
        new_h = jnp.tanh(new_c) * jax.nn.sigmoid(o)
        return (new_c, new_h), new_h

    @staticmethod
    def zero_state(batch: int, h: int, w: int, features: int, dtype=jnp.float32):
        z = jnp.zeros((batch, h, w, features), dtype)
        return (z, z)
