"""Shape/dtype/jit tests for all 7 model families (SURVEY.md §4 (b))."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pfnl_tpu.models import PFNL, VESPCN, MCResNet, LTDVSR, FRVSR, DRVSR, DUF


def _init_and_apply(model, x, **kwargs):
    variables = model.init(jax.random.PRNGKey(0), x, **kwargs)
    out = model.apply(variables, x, **kwargs)
    return variables, out


def _param_count(variables):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))


def test_pfnl_forward_shapes():
    x = jnp.zeros((2, 7, 16, 16, 3))
    model = PFNL()
    variables, out = _init_and_apply(model, x)
    assert out["sr"].shape == (2, 1, 64, 64, 3)
    # ~3M params like the reference PFNL (pfnl.py:159 prints ~3.0e6)
    n = _param_count(variables)
    assert 2.5e6 < n < 3.5e6, n


def test_pfnl_jit_and_finite():
    x = jnp.asarray(np.random.default_rng(1).random((1, 7, 16, 16, 3)), jnp.float32)
    model = PFNL(num_blocks=2)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = jax.jit(lambda v, x: model.apply(v, x)["sr"])(variables, x)
    assert np.all(np.isfinite(np.asarray(out)))


def test_vespcn_forward():
    x = jnp.zeros((1, 3, 16, 16, 3))
    model = VESPCN()
    variables, out = _init_and_apply(model, x)
    assert out["sr"].shape == (1, 1, 64, 64, 1)
    assert out["uv"].shape == (1, 3, 16, 16, 2)
    assert out["frames_y"].shape == (1, 3, 16, 16, 1)


def test_mcresnet_forward():
    x = jnp.zeros((1, 5, 16, 16, 3))
    model = MCResNet()
    variables, out = _init_and_apply(model, x)
    assert out["sr"].shape == (1, 1, 64, 64, 1)
    # distance-shared encoders: only 3 enc1_* kernels for 5 frames
    enc_names = [
        k for k in variables["params"] if k.startswith("enc1_") and "prelu" not in k
    ]
    assert sorted(enc_names) == ["enc1_0", "enc1_1", "enc1_2"]


def test_ltdvsr_forward():
    x = jnp.zeros((1, 5, 16, 16, 3))
    model = LTDVSR()
    variables, out = _init_and_apply(model, x)
    assert out["sr"].shape == (1, 1, 64, 64, 1)


def test_frvsr_forward_recurrent():
    x = jnp.zeros((2, 4, 16, 16, 3))
    model = FRVSR(num_frames=4)
    variables, out = _init_and_apply(model, x)
    assert out["sr"].shape == (2, 4, 64, 64, 3)
    assert out["warps"].shape == (2, 3, 16, 16, 3)


def test_frvsr_streaming_step_matches_unroll():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((1, 3, 8, 8, 3)), jnp.float32)
    model = FRVSR(num_frames=3, mf=8, num_blocks=1)
    variables = model.init(jax.random.PRNGKey(0), x)
    full = model.apply(variables, x)["sr"]

    sr = model.apply(variables, x[:, 0], method=model.step)
    np.testing.assert_allclose(np.asarray(sr), np.asarray(full[:, 0]), atol=1e-5)
    sr = model.apply(variables, x[:, 1], x[:, 0], sr, method=model.step)
    np.testing.assert_allclose(np.asarray(sr), np.asarray(full[:, 1]), atol=1e-5)


def test_drvsr_forward():
    x = jnp.zeros((1, 3, 16, 16, 3))
    model = DRVSR()
    variables, out = _init_and_apply(model, x)
    assert out["sr"].shape == (1, 3, 64, 64, 1)
    assert out["warped_lr"].shape == (1, 3, 16, 16, 1)


@pytest.mark.parametrize("layers", [16, 52])
def test_duf_forward(layers):
    x = jnp.zeros((1, 7, 8, 8, 3))
    model = DUF(layers=layers)
    variables = model.init(jax.random.PRNGKey(0), x, is_train=True)
    out, mutated = model.apply(
        variables, x, is_train=True, mutable=["batch_stats"]
    )
    assert out["sr"].shape == (1, 1, 32, 32, 3)
    out_eval = model.apply(variables, x, is_train=False)
    assert out_eval["sr"].shape == (1, 1, 32, 32, 3)
    # batch_stats exist and moving_variance initialized to 0 (quirk)
    stats = variables["batch_stats"]
    leaf = jax.tree.leaves(stats)[0]
    assert np.all(np.asarray(leaf) == 0)


def test_refbatchnorm_zero_debias():
    """TF assign_moving_average(zero_debias=True) semantics
    (reference utils.py:269-276): the read moving stat is the biased EMA
    divided by (1 - decay^t), so a constant batch stream makes
    moving == batch stat EXACTLY after one update (TF-oracle: a plain
    EMA from 0 would read 1000x smaller at decay=0.999)."""
    from pfnl_tpu.models.duf import RefBatchNorm

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(2.0, 3.0, (4, 8, 8, 5)), jnp.float32)
    bn = RefBatchNorm(features=5)
    variables = bn.init(jax.random.PRNGKey(0), x, is_train=True)
    # init: everything zero (moving_variance=0 quirk preserved)
    assert all(np.all(np.asarray(v) == 0)
               for v in jax.tree.leaves(variables["batch_stats"]))

    batch_mean = np.mean(np.asarray(x, np.float64), (0, 1, 2))
    batch_var = np.var(np.asarray(x, np.float64), (0, 1, 2))
    for t in (1, 2, 3):  # constant stream: moving == batch stat each step
        _, mut = bn.apply(variables, x, is_train=True,
                          mutable=["batch_stats"])
        variables = {"params": variables["params"], **mut}
        st = mut["batch_stats"]
        np.testing.assert_allclose(np.asarray(st["moving_mean"]),
                                   batch_mean, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(st["moving_variance"]),
                                   batch_var, rtol=1e-4)
        assert float(st["local_step"]) == t
    # eval now uses the (immediately-converged) moving stats
    y = bn.apply(variables, x, is_train=False)
    ref = (np.asarray(x, np.float64) - batch_mean) / np.sqrt(
        batch_var + 1e-3)
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4)


def test_pfnl_head_blockdiag_matches_per_frame():
    """conv0-as-block-diagonal-conv head == per-frame shared conv0 on the
    same params (the variant keeps the MXU at 448 lanes; see
    scripts/pfnl_head_bench.py stage H)."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.random((1, 3, 16, 18, 3)), jnp.float32)
    m_pf = PFNL(num_frames=3, num_blocks=2, head_impl="per_frame")
    m_bd = PFNL(num_frames=3, num_blocks=2, head_impl="blockdiag")
    variables = m_pf.init(jax.random.PRNGKey(0), x)
    a = np.asarray(m_pf.apply(variables, x)["sr"])
    b = np.asarray(m_bd.apply(variables, x)["sr"])
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_pfnl_pallas_chain_path_matches_xla():
    """Model-level equivalence of the two PFRB execution paths (interpret)."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((1, 3, 16, 18, 3)), jnp.float32)
    m_xla = PFNL(num_frames=3, num_blocks=2, pfrb_impl="xla")
    m_pal = PFNL(num_frames=3, num_blocks=2, pfrb_impl="pallas_chain")
    variables = m_xla.init(jax.random.PRNGKey(0), x)
    a = np.asarray(m_xla.apply(variables, x)["sr"])
    b = np.asarray(m_pal.apply(variables, x)["sr"])
    np.testing.assert_allclose(a, b, atol=2e-5)
