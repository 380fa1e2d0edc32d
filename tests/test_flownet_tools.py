"""FlowNet-S/C ports, warp confidence, and flow tools."""

import numpy as np
import jax
import jax.numpy as jnp

from pfnl_tpu.models.flownet import FlowNetS, FlowNetC, WarpConfidence, correlation
from pfnl_tpu.utils.flow_tools import (
    read_flo,
    write_flo,
    flow_epe,
    flow_aae,
    flow_to_color,
)


def test_flownet_s_shapes(rng):
    model = FlowNetS()
    a = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), a, a)
    uv = model.apply(variables, a, a)
    assert uv.shape == (1, 64, 64, 2)
    assert np.all(np.isfinite(np.asarray(uv)))


def test_flownet_c_and_correlation(rng):
    a = jnp.asarray(rng.random((1, 8, 8, 4)).astype(np.float32))
    b = jnp.asarray(rng.random((1, 8, 8, 4)).astype(np.float32))
    corr = np.asarray(correlation(a, b, max_disp=2))
    assert corr.shape == (1, 8, 8, 25)
    # zero-displacement channel == mean over channels of a*b
    center = np.asarray(jnp.mean(a * b, axis=-1))
    np.testing.assert_allclose(corr[..., 12], center, atol=1e-6)

    model = FlowNetC(max_disp=4)
    x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, x)
    uv = model.apply(variables, x, x)
    assert uv.shape == (1, 64, 64, 2)


def test_warp_confidence(rng):
    model = WarpConfidence()
    img = jnp.asarray(rng.random((1, 16, 16, 1)).astype(np.float32))
    uv = jnp.zeros((1, 16, 16, 2))
    variables = model.init(jax.random.PRNGKey(0), img, img, uv)
    conf = np.asarray(model.apply(variables, img, img, uv))
    assert conf.shape == (1, 16, 16, 1)
    assert np.all((conf >= 0) & (conf <= 1))


def test_flo_roundtrip(tmp_path, rng):
    flow = rng.standard_normal((6, 8, 2)).astype(np.float32)
    p = str(tmp_path / "a.flo")
    write_flo(p, flow)
    np.testing.assert_array_equal(read_flo(p), flow)


def test_flow_metrics():
    gt = np.ones((4, 4, 2), np.float32)
    assert flow_epe(gt, gt) == 0.0
    assert flow_aae(gt, gt) == 0.0
    off = gt + np.array([1.0, 0.0])
    assert flow_epe(off, gt) == 1.0


def test_flow_to_color(rng):
    flow = rng.standard_normal((10, 12, 2)).astype(np.float32)
    img = flow_to_color(flow)
    assert img.shape == (10, 12, 3) and img.dtype == np.uint8
    # zero flow with max_flow set is near-white (rad=0 -> 1-0*(1-col))
    white = flow_to_color(np.zeros((4, 4, 2), np.float32), max_flow=1.0)
    assert np.all(white >= 250)
