"""Exactness of the space-to-depth-packed conv rewrites
(pfnl_tpu/ops/packed_conv.py) against the plain flax/lax ops they
replace, plus the packed DRVSR _SRStep against the plain one."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn
import pytest

from pfnl_tpu.ops.packed_conv import (conv_down2_packed, conv_s1_packed,
                                      conv_up2_packed)
from pfnl_tpu.ops.shuffle import depth_to_space, space_to_depth

pytestmark = pytest.mark.quick


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


@pytest.mark.parametrize("k,ci,co", [(3, 32, 32), (5, 32, 1), (5, 1, 32),
                                     (3, 128, 3)])
def test_s1_pack_exact(k, ci, co):
    rng = np.random.default_rng(0)
    x = _rand(rng, 2, 12, 16, ci)
    kern = _rand(rng, k, k, ci, co)
    bias = _rand(rng, co)
    ref = lax.conv_general_dilated(
        x, kern, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    got = depth_to_space(conv_s1_packed(space_to_depth(x, 2), kern, bias), 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=2e-4)


@pytest.mark.parametrize("k,ci,co", [(3, 32, 64), (3, 64, 128), (5, 8, 16)])
def test_down2_pack_exact(k, ci, co):
    rng = np.random.default_rng(1)
    x = _rand(rng, 2, 12, 16, ci)
    kern = _rand(rng, k, k, ci, co)
    bias = _rand(rng, co)
    ref = lax.conv_general_dilated(
        x, kern, (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    got = conv_down2_packed(space_to_depth(x, 2), kern, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=2e-4)


@pytest.mark.parametrize("k,ci,co", [(4, 64, 32), (4, 128, 64), (3, 16, 8)])
def test_up2_pack_exact(k, ci, co):
    rng = np.random.default_rng(2)
    x = _rand(rng, 2, 6, 8, ci)
    kern = _rand(rng, k, k, ci, co)
    bias = _rand(rng, co)
    ref = nn.ConvTranspose(co, (k, k), strides=(2, 2), padding="SAME").apply(
        {"params": {"kernel": kern, "bias": bias}}, x)
    got = depth_to_space(conv_up2_packed(x, kern, bias), 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=2e-4)


def test_packing_differentiable():
    """The packed execution must backprop to the ORIGINAL kernel layout
    with the same gradients as the plain op."""
    rng = np.random.default_rng(3)
    x = _rand(rng, 1, 8, 8, 4)
    kern = _rand(rng, 3, 3, 4, 4)

    def loss_plain(k):
        y = lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y ** 2)

    def loss_packed(k):
        y = conv_s1_packed(space_to_depth(x, 2), k)
        return jnp.sum(y ** 2)

    g0 = jax.grad(loss_plain)(kern)
    g1 = jax.grad(loss_packed)(kern)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-4, atol=1e-5)


def test_drvsr_step_packed_matches_plain():
    from pfnl_tpu.models.drvsr import _SRStep
    from pfnl_tpu.ops.convlstm import ConvLSTMCell

    rng = np.random.default_rng(4)
    n, oh, ow = 2, 16, 24
    x = _rand(rng, n, oh, ow, 1)
    state0 = ConvLSTMCell.zero_state(n, oh // 4, ow // 4, 128, jnp.float32)
    plain = _SRStep(impl="plain")
    packed = _SRStep(impl="packed")
    variables = plain.init(jax.random.PRNGKey(0), state0, x)
    (c0, h0), y0 = plain.apply(variables, state0, x)
    (c1, h1), y1 = packed.apply(variables, state0, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h0),
                               rtol=1e-4, atol=1e-5)
    # encoder-only mode used by last_only inference
    (c0, h0), _ = plain.apply(variables, state0, x, decode=False)
    (c1, h1), _ = packed.apply(variables, state0, x, decode=False)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_frvsr_tail_packed_matches_plain():
    from pfnl_tpu.models.frvsr import FRVSR

    rng = np.random.default_rng(6)
    x = _rand(rng, 1, 4, 8, 12, 3)
    plain = FRVSR(num_frames=4, tail_impl="plain")
    packed = FRVSR(num_frames=4, tail_impl="packed")
    variables = plain.init(jax.random.PRNGKey(0), x)
    y0 = plain.apply(variables, x)
    y1 = packed.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y1["sr"]), np.asarray(y0["sr"]),
                               rtol=1e-4, atol=1e-4)
    # streaming step
    s0 = plain.apply(variables, x[:, 0], method=plain.step)
    s1 = packed.apply(variables, x[:, 0], method=packed.step)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_drvsr_model_packed_matches_plain():
    from pfnl_tpu.models.drvsr import DRVSR

    rng = np.random.default_rng(5)
    x = _rand(rng, 1, 3, 8, 12, 3)
    plain = DRVSR(step_impl="plain")
    packed = DRVSR(step_impl="packed")
    variables = plain.init(jax.random.PRNGKey(0), x)
    y0 = plain.apply(variables, x)
    y1 = packed.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y1["sr"]), np.asarray(y0["sr"]),
                               rtol=1e-4, atol=1e-5)
    y0 = plain.apply(variables, x, last_only=True)
    y1 = packed.apply(variables, x, last_only=True)
    np.testing.assert_allclose(np.asarray(y1["sr"]), np.asarray(y0["sr"]),
                               rtol=1e-4, atol=1e-5)


def test_easyflow_packed_matches_plain():
    from pfnl_tpu.models.flows import EasyFlow

    rng = np.random.default_rng(7)
    a = _rand(rng, 2, 16, 24, 1)
    b = _rand(rng, 2, 16, 24, 1)
    plain = EasyFlow(impl="plain")
    packed = EasyFlow(impl="packed")
    variables = plain.init(jax.random.PRNGKey(0), a, b)
    y0 = plain.apply(variables, a, b)
    y1 = packed.apply(variables, a, b)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-4, atol=1e-5)
    # the packed path trains: grads w.r.t. the ORIGINAL kernels match
    def loss(v, m):
        return jnp.mean(m.apply(v, a, b) ** 2)

    g0 = jax.grad(loss)(variables, plain)
    g1 = jax.grad(loss)(variables, packed)
    jax.tree.map(
        lambda u, v: np.testing.assert_allclose(
            np.asarray(v), np.asarray(u), rtol=1e-3, atol=1e-5),
        g0, g1)


def test_easyflow_packed_rejects_odd_sizes():
    from pfnl_tpu.models.flows import EasyFlow

    rng = np.random.default_rng(8)
    a = _rand(rng, 1, 18, 24, 1)
    b = _rand(rng, 1, 18, 24, 1)
    packed = EasyFlow(impl="packed")
    with pytest.raises(ValueError):
        packed.init(jax.random.PRNGKey(0), a, b)


def test_mcresnet_trunk_packed_matches_plain():
    from pfnl_tpu.models.mcresnet import MCResNet

    rng = np.random.default_rng(9)
    x = _rand(rng, 2, 5, 16, 24, 3)
    plain = MCResNet(trunk_impl="plain")
    packed = MCResNet(trunk_impl="packed")
    variables = plain.init(jax.random.PRNGKey(0), x)
    # randomize every param (PReLU alphas init to zero, which would make
    # the phase-major alpha tiling untested)
    leaves, treedef = jax.tree.flatten(variables)
    leaves = [jnp.asarray(rng.standard_normal(l.shape), l.dtype) * 0.1
              for l in leaves]
    variables = jax.tree.unflatten(treedef, leaves)
    y0 = plain.apply(variables, x)
    y1 = packed.apply(variables, x)
    # random 0.1-scale params through the 9-conv accumulating trunk give
    # outputs of magnitude ~200: atol reflects f32 reduction-order noise
    np.testing.assert_allclose(np.asarray(y1["sr"]), np.asarray(y0["sr"]),
                               rtol=1e-4, atol=1e-3)


@pytest.mark.slow
def test_mcresnet_packed_grads_match():
    from pfnl_tpu.models.mcresnet import MCResNet

    rng = np.random.default_rng(10)
    x = _rand(rng, 1, 5, 8, 12, 3)
    plain = MCResNet(trunk_impl="plain")
    packed = MCResNet(trunk_impl="packed")
    variables = plain.init(jax.random.PRNGKey(0), x)

    def loss(v, m):
        return jnp.mean(m.apply(v, x)["sr"] ** 2)

    g0 = jax.grad(loss)(variables, plain)
    g1 = jax.grad(loss)(variables, packed)
    jax.tree.map(
        lambda u, v: np.testing.assert_allclose(
            np.asarray(v), np.asarray(u), rtol=1e-3, atol=1e-5),
        g0, g1)


def test_vespcn_trunk_packed_matches_plain():
    from pfnl_tpu.models.vespcn import VESPCN

    rng = np.random.default_rng(11)
    x = _rand(rng, 2, 3, 16, 24, 3)
    plain = VESPCN(trunk_impl="plain")
    packed = VESPCN(trunk_impl="packed")
    variables = plain.init(jax.random.PRNGKey(0), x)
    leaves, treedef = jax.tree.flatten(variables)
    leaves = [jnp.asarray(rng.standard_normal(l.shape), l.dtype) * 0.1
              for l in leaves]
    variables = jax.tree.unflatten(treedef, leaves)
    y0 = plain.apply(variables, x)
    y1 = packed.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y1["sr"]), np.asarray(y0["sr"]),
                               rtol=1e-4, atol=1e-4)


def test_ltdvsr_tem_packed_matches_plain():
    from pfnl_tpu.models.ltdvsr import LTDVSR

    rng = np.random.default_rng(12)
    x = _rand(rng, 2, 5, 8, 12, 3)
    plain = LTDVSR(tem_impl="plain")
    packed = LTDVSR(tem_impl="packed")
    variables = plain.init(jax.random.PRNGKey(0), x)
    leaves, treedef = jax.tree.flatten(variables)
    leaves = [jnp.asarray(rng.standard_normal(l.shape), l.dtype) * 0.1
              for l in leaves]
    variables = jax.tree.unflatten(treedef, leaves)
    y0 = plain.apply(variables, x)
    y1 = packed.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y1["sr"]), np.asarray(y0["sr"]),
                               rtol=1e-4, atol=1e-4)


def test_ltdflow_packed_matches_plain():
    from pfnl_tpu.models.flows import LTDFlow

    rng = np.random.default_rng(13)
    a = _rand(rng, 3, 16, 24, 1)
    b = _rand(rng, 3, 16, 24, 1)
    plain = LTDFlow(impl="plain")
    packed = LTDFlow(impl="packed")
    variables = plain.init(jax.random.PRNGKey(0), a, b)
    leaves, treedef = jax.tree.flatten(variables)
    leaves = [jnp.asarray(rng.standard_normal(l.shape), l.dtype) * 0.1
              for l in leaves]
    variables = jax.tree.unflatten(treedef, leaves)
    y0 = plain.apply(variables, a, b)
    y1 = packed.apply(variables, a, b)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-4, atol=1e-4)

    # gradients w.r.t. params agree through the packed rewrites + phase-max
    def loss(impl):
        mod = LTDFlow(impl=impl)
        return lambda v: jnp.sum(mod.apply(v, a, b) ** 2)

    g0 = jax.grad(loss("plain"))(variables)
    g1 = jax.grad(loss("packed"))(variables)
    jax.tree.map(lambda u, v: np.testing.assert_allclose(
        np.asarray(v), np.asarray(u), rtol=1e-3, atol=1e-4), g0, g1)
