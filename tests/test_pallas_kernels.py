"""Pallas kernels vs dense references (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pfnl_tpu.ops.nonlocal_attn import nonlocal_attention
from pfnl_tpu.ops.pallas.nonlocal_flash import nonlocal_flash


@pytest.mark.parametrize("n,m,d", [(100, 100, 21), (256, 256, 84), (300, 200, 30)])
def test_nonlocal_flash_matches_dense(rng, n, m, d):
    theta = rng.standard_normal((2, n, d)).astype(np.float32)
    phi = rng.standard_normal((2, m, d)).astype(np.float32)
    g = rng.standard_normal((2, m, d)).astype(np.float32)
    dense = np.asarray(nonlocal_attention(jnp.asarray(theta), jnp.asarray(phi), jnp.asarray(g)))
    flash = np.asarray(
        nonlocal_flash(jnp.asarray(theta), jnp.asarray(phi), jnp.asarray(g),
                       bq=128, bk=128, interpret=True)
    )
    np.testing.assert_allclose(flash, dense, atol=2e-5)


def test_nonlocal_flash_large_logits(rng):
    theta = (rng.standard_normal((1, 130, 16)) * 20).astype(np.float32)
    phi = (rng.standard_normal((1, 130, 16)) * 20).astype(np.float32)
    g = rng.standard_normal((1, 130, 16)).astype(np.float32)
    out = np.asarray(
        nonlocal_flash(jnp.asarray(theta), jnp.asarray(phi), jnp.asarray(g),
                       bq=128, bk=128, interpret=True)
    )
    assert np.all(np.isfinite(out))
    ref = np.asarray(nonlocal_attention(jnp.asarray(theta), jnp.asarray(phi), jnp.asarray(g)))
    np.testing.assert_allclose(out, ref, atol=1e-4)
