"""Tests for non-local attention variants, dynfilter, convlstm, losses."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pfnl_tpu.ops.nonlocal_attn import nonlocal_attention, nonlocal_attention_chunked
from pfnl_tpu.ops.dynfilter import dyn_filter_3d
from pfnl_tpu.ops.convlstm import ConvLSTMCell
from pfnl_tpu.ops.losses import charbonnier, huber, total_variation

pytestmark = pytest.mark.quick


def _np_reference_nonlocal(theta, phi, g, mode="softmax"):
    """Literal transcription of utils.py:53-64 (raw exp, no stabilization)."""
    f = np.einsum("bnd,bmd->bnm", theta, phi).astype(np.float64)
    if mode == "softmax":
        f = np.exp(f)
        f = f / f.sum(-1, keepdims=True)
    else:
        f = np.maximum(f, 0)
        f = f / f.sum(-1, keepdims=True)
    return np.einsum("bnm,bmd->bnd", f, g.astype(np.float64))


def test_dense_attention_matches_reference(rng):
    theta = rng.standard_normal((2, 12, 5)).astype(np.float32)
    phi = rng.standard_normal((2, 12, 5)).astype(np.float32)
    g = rng.standard_normal((2, 12, 5)).astype(np.float32)
    ref = _np_reference_nonlocal(theta, phi, g)
    for stabilize in (True, False):
        got = np.asarray(nonlocal_attention(theta, phi, g, stabilize=stabilize))
        np.testing.assert_allclose(got, ref, atol=1e-5)


def test_relu_mean_attention(rng):
    theta = rng.standard_normal((1, 9, 4)).astype(np.float32)
    phi = rng.standard_normal((1, 9, 4)).astype(np.float32)
    g = rng.standard_normal((1, 9, 4)).astype(np.float32)
    got = np.asarray(nonlocal_attention(theta, phi, g, mode="relu_mean"))
    ref = _np_reference_nonlocal(theta, phi, g, mode="relu")
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_chunked_attention_matches_dense(rng):
    theta = rng.standard_normal((2, 50, 8)).astype(np.float32)
    phi = rng.standard_normal((2, 50, 8)).astype(np.float32)
    g = rng.standard_normal((2, 50, 8)).astype(np.float32)
    dense = np.asarray(nonlocal_attention(theta, phi, g))
    for block in (7, 16, 50, 64):
        chunked = np.asarray(nonlocal_attention_chunked(theta, phi, g, block=block))
        np.testing.assert_allclose(chunked, dense, atol=1e-5)


def test_chunked_attention_survives_large_logits(rng):
    """The reference's raw exp overflows for logits > ~88; the streaming
    softmax must not (Appendix A fix, flag-gated)."""
    theta = rng.standard_normal((1, 16, 4)).astype(np.float32) * 20
    phi = rng.standard_normal((1, 16, 4)).astype(np.float32) * 20
    g = rng.standard_normal((1, 16, 4)).astype(np.float32)
    out = np.asarray(nonlocal_attention_chunked(theta, phi, g, block=8))
    assert np.all(np.isfinite(out))
    stable = np.asarray(nonlocal_attention(theta, phi, g, stabilize=True))
    np.testing.assert_allclose(out, stable, atol=1e-4)


def _np_dynfilter(x, F):
    """Literal transcription of DynFilter3D (utils.py:330-348), T=1."""
    b, t, h, w = x.shape
    patches = np.zeros((b, h, w, 25), x.dtype)
    padded = np.pad(x[:, 0], ((0, 0), (2, 2), (2, 2)))
    for i in range(5):
        for j in range(5):
            patches[..., i * 5 + j] = padded[:, i : i + h, j : j + w]
    return np.einsum("bhwp,bhwpr->bhwr", patches, F)


def test_dynfilter_matches_reference(rng):
    x = rng.random((2, 1, 6, 7)).astype(np.float32)
    F = rng.random((2, 6, 7, 25, 16)).astype(np.float32)
    got = np.asarray(dyn_filter_3d(x, F, (1, 5, 5)))
    np.testing.assert_allclose(got, _np_dynfilter(x, F), atol=1e-5)


def test_dynfilter_identity_filter(rng):
    """A one-hot filter at the center tap reproduces the input pixel."""
    x = rng.random((1, 1, 4, 4)).astype(np.float32)
    F = np.zeros((1, 4, 4, 25, 1), np.float32)
    F[:, :, :, 12, 0] = 1.0  # center of the 5x5 window (row-major)
    got = np.asarray(dyn_filter_3d(x, F, (1, 5, 5)))
    np.testing.assert_allclose(got[..., 0], x[:, 0], atol=1e-6)


def test_convlstm_cell_shapes_and_gates(rng):
    cell = ConvLSTMCell(8, (3, 3))
    x = jnp.asarray(rng.random((2, 4, 4, 5)).astype(np.float32))
    state = ConvLSTMCell.zero_state(2, 4, 4, 8)
    params = cell.init(jax.random.PRNGKey(0), state, x)
    (new_c, new_h), out = cell.apply(params, state, x)
    assert new_c.shape == (2, 4, 4, 8) and new_h.shape == (2, 4, 4, 8)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(new_h))
    # gate conv: input channels = x + h
    k = params["params"]["gates"]["kernel"]
    assert k.shape == (3, 3, 5 + 8, 32)


def test_losses(rng):
    x = rng.random((2, 3, 4, 1)).astype(np.float32)
    y = rng.random((2, 3, 4, 1)).astype(np.float32)
    cb = float(charbonnier(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(cb, np.mean(np.sqrt((x - y) ** 2 + 1e-6)), atol=1e-6)

    d = 0.01
    abs_err = np.abs(x - y)
    quad = np.minimum(abs_err, d)
    ref_huber = np.mean(0.5 * quad**2 + d * (abs_err - quad))
    np.testing.assert_allclose(float(huber(jnp.asarray(y), jnp.asarray(x), d)), ref_huber, atol=1e-7)

    imgs = rng.random((2, 5, 6, 3)).astype(np.float32)
    tv_ref = np.abs(np.diff(imgs, axis=1)).sum() + np.abs(np.diff(imgs, axis=2)).sum()
    np.testing.assert_allclose(float(total_variation(jnp.asarray(imgs))), tv_ref, rtol=1e-5)
