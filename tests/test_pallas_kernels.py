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


def test_pfrb_chains_match_xla(rng):
    """The packed PFRB chain vs the XLA reference (interpret mode)."""
    import jax.numpy as jnp
    from pfnl_tpu.ops.pallas.pfrb_xla import pfrb_chain_xla
    from pfnl_tpu.ops.pallas.pfrb_pack import pfrb_chain_pack

    c, t = 64, 3
    params = [
        tuple(
            jnp.asarray(rng.standard_normal(s).astype(np.float32)) * 0.05
            for s in [(3, 3, c, c), (c,), (t, c, c), (c,), (3, 3, c, c),
                      (3, 3, c, c), (c,)]
        )
        for _ in range(2)
    ]
    feat = jnp.asarray(rng.standard_normal((1, t, 10, 18, c)).astype(np.float32)) * 0.1
    ref = np.asarray(pfrb_chain_xla(feat, params))
    np.testing.assert_allclose(np.asarray(pfrb_chain_pack(feat, params)), ref, atol=2e-6)


def test_pfnl_tail_pack_matches_xla(rng):
    """Fused blocks+tail path vs the XLA composition (interpret mode)."""
    import jax
    import jax.numpy as jnp
    from pfnl_tpu.ops.pallas.pfnl_tail import _xla_blocks_tail, blocks_and_tail_pack

    c, t = 64, 7
    params = [
        tuple(
            jnp.asarray(rng.standard_normal(s).astype(np.float32)) * 0.05
            for s in [(3, 3, c, c), (c,), (t, c, c), (c,), (3, 3, c, c),
                      (3, 3, c, c), (c,)]
        )
    ]
    feat = jnp.asarray(rng.standard_normal((1, t, 9, 13, c)).astype(np.float32)) * 0.1
    wm1 = jnp.asarray(rng.standard_normal((3, 3, t * c, 48)).astype(np.float32)) * 0.05
    bm1 = jnp.asarray(rng.standard_normal(48).astype(np.float32)) * 0.1
    km2 = jnp.asarray(rng.standard_normal((3, 3, 12, 12)).astype(np.float32)) * 0.05
    bm2 = jnp.asarray(rng.standard_normal(12).astype(np.float32)) * 0.1

    ref = np.asarray(_xla_blocks_tail(feat, params, wm1, bm1, km2, bm2))
    got = np.asarray(blocks_and_tail_pack(feat, params, wm1, bm1, km2, bm2))
    np.testing.assert_allclose(got, ref, atol=2e-5)

    # gradient goes through the XLA fallback
    g = jax.grad(lambda f: jnp.sum(blocks_and_tail_pack(f, params, wm1, bm1, km2, bm2) ** 2))(feat)
    gr = jax.grad(lambda f: jnp.sum(_xla_blocks_tail(f, params, wm1, bm1, km2, bm2) ** 2))(feat)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=1e-4)


def test_pfrb_pack_odd_sizes(rng):
    """Pair-packed path at odd H/W and T not divisible by the frame group."""
    import jax.numpy as jnp
    from pfnl_tpu.ops.pallas.pfrb_xla import pfrb_chain_xla
    from pfnl_tpu.ops.pallas.pfrb_pack import pfrb_chain_pack

    c, t = 64, 5
    params = [
        tuple(
            jnp.asarray(rng.standard_normal(s).astype(np.float32)) * 0.05
            for s in [(3, 3, c, c), (c,), (t, c, c), (c,), (3, 3, c, c),
                      (3, 3, c, c), (c,)]
        )
    ]
    feat = jnp.asarray(rng.standard_normal((1, t, 9, 13, c)).astype(np.float32)) * 0.1
    ref = np.asarray(pfrb_chain_xla(feat, params))
    np.testing.assert_allclose(np.asarray(pfrb_chain_pack(feat, params)), ref, atol=2e-6)


def test_pfrb_chain_gradient(rng):
    import jax
    import jax.numpy as jnp
    from pfnl_tpu.ops.pallas.pfrb_xla import pfrb_chain_xla
    from pfnl_tpu.ops.pallas.pfrb_pack import pfrb_chain_pack

    c, t = 64, 2
    params = [
        tuple(
            jnp.asarray(rng.standard_normal(s).astype(np.float32)) * 0.05
            for s in [(3, 3, c, c), (c,), (t, c, c), (c,), (3, 3, c, c),
                      (3, 3, c, c), (c,)]
        )
    ]
    feat = jnp.asarray(rng.standard_normal((1, t, 8, 16, c)).astype(np.float32)) * 0.1
    gr = jax.grad(lambda f: jnp.sum(pfrb_chain_xla(f, params) ** 2))(feat)
    gp = jax.grad(lambda f: jnp.sum(pfrb_chain_pack(f, params) ** 2))(feat)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr), atol=1e-4)


def test_pfrb_pallas_backward_matches_autodiff(rng):
    """Pallas backward kernels (chain_bwd_pallas) vs jax.grad of the XLA
    chain — data and all parameter gradients (interpret mode)."""
    import jax
    import jax.numpy as jnp
    from pfnl_tpu.ops.pallas.pfrb_bwd import chain_bwd_pallas
    from pfnl_tpu.ops.pallas.pfrb_xla import pfrb_chain_xla
    from pfnl_tpu.ops.pallas.pfrb_pack import (
        _chain_pack_run, pick_rows, pick_tb,
    )

    c, t, h, w = 64, 3, 10, 14
    feat = jnp.asarray(rng.standard_normal((1, t, h, w, c)).astype(np.float32)) * 0.1
    params = [
        tuple(
            jnp.asarray(rng.standard_normal(s).astype(np.float32)) * 0.05
            for s in [(3, 3, c, c), (c,), (t, c, c), (c,), (3, 3, c, c),
                      (3, 3, c, c), (c,)]
        )
        for _ in range(2)
    ]
    out, (feats, i1s, bases) = _chain_pack_run(feat, params, collect=True)
    g = jnp.asarray(rng.standard_normal(out.shape).astype(np.float32))
    df, dps = chain_bwd_pallas(feats, i1s, bases, params, g, h, w,
                               pick_rows(h), pick_tb(t))
    gf, gps = jax.grad(
        lambda f, ps: jnp.sum(pfrb_chain_xla(f, ps) * g), argnums=(0, 1)
    )(feat, params)
    np.testing.assert_allclose(np.asarray(df), np.asarray(gf), atol=1e-4)
    for k in range(2):
        for a, b in zip(dps[k], gps[k]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_conv0_packed_matches_per_frame(rng):
    """conv0_packed (conv5x5 emitted born-packed via a pair-grid kernel)
    == per-frame XLA conv0 + pad_to_pack_layout, at several geometries."""
    from pfnl_tpu.ops.pallas.common import _lrelu
    from pfnl_tpu.ops.pallas.pfrb_pack import (
        conv0_packed, pad_to_pack_layout, pick_rows)

    for (t, h, w) in [(7, 9, 14), (3, 16, 32), (7, 11, 40)]:
        c, f = 3, 64
        frames = jnp.asarray(
            rng.standard_normal((2, t, h, w, c)).astype(np.float32)) * 0.3
        k0 = jnp.asarray(
            rng.standard_normal((5, 5, c, f)).astype(np.float32)) * 0.2
        b0 = jnp.asarray(rng.standard_normal((f,)).astype(np.float32)) * 0.1
        o = jax.lax.conv_general_dilated(
            frames.reshape(2 * t, h, w, c), k0, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        ref_feat = _lrelu(o + b0).reshape(2, t, h, w, f)
        ref = np.asarray(pad_to_pack_layout(ref_feat, rows=pick_rows(h)))
        got = np.asarray(conv0_packed(frames, k0, b0))
        assert got.shape == ref.shape, (got.shape, ref.shape)
        np.testing.assert_allclose(got, ref, atol=2e-5)


def test_blocks_and_tail_prepacked_matches_xla(rng):
    """Born-packed head composition (conv0_packed ->
    blocks_and_tail_prepacked) == XLA conv0 + _xla_blocks_tail, forward
    and gradients w.r.t. the frames AND conv0 weights (interpret mode)."""
    from pfnl_tpu.ops.pallas.common import _lrelu
    from pfnl_tpu.ops.pallas.pfnl_tail import (
        _xla_blocks_tail, blocks_and_tail_prepacked)
    from pfnl_tpu.ops.pallas.pfrb_pack import conv0_packed

    c, t, h, w = 64, 7, 10, 14
    params = [
        tuple(
            jnp.asarray(rng.standard_normal(s).astype(np.float32)) * 0.05
            for s in [(3, 3, c, c), (c,), (t, c, c), (c,), (3, 3, c, c),
                      (3, 3, c, c), (c,)]
        )
        for _ in range(2)
    ]
    frames = jnp.asarray(
        rng.standard_normal((1, t, h, w, 3)).astype(np.float32)) * 0.3
    k0 = jnp.asarray(rng.standard_normal((5, 5, 3, c)).astype(np.float32)) * 0.2
    b0 = jnp.asarray(rng.standard_normal((c,)).astype(np.float32)) * 0.1
    wm1 = jnp.asarray(rng.standard_normal((3, 3, t * c, 48)).astype(np.float32)) * 0.05
    bm1 = jnp.asarray(rng.standard_normal(48).astype(np.float32)) * 0.1
    km2 = jnp.asarray(rng.standard_normal((3, 3, 12, 12)).astype(np.float32)) * 0.05
    bm2 = jnp.asarray(rng.standard_normal(12).astype(np.float32)) * 0.1

    def f_ref(frames, k0):
        o = jax.lax.conv_general_dilated(
            frames.reshape(t, h, w, 3), k0, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        feat = _lrelu(o + b0).reshape(1, t, h, w, c)
        return _xla_blocks_tail(feat, params, wm1, bm1, km2, bm2)

    def f_packed(frames, k0):
        packed = conv0_packed(frames, k0, b0)
        return blocks_and_tail_prepacked(
            packed, params, wm1, bm1, km2, bm2, t, h, w)

    ref = np.asarray(f_ref(frames, k0))
    got = np.asarray(f_packed(frames, k0))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5)

    gr = jax.grad(lambda fr, k: jnp.sum(f_ref(fr, k) ** 2), argnums=(0, 1))(
        frames, k0)
    gp = jax.grad(lambda fr, k: jnp.sum(f_packed(fr, k) ** 2), argnums=(0, 1))(
        frames, k0)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]), atol=1e-4)


def test_pfnl_packed_head_matches_per_frame(rng):
    """Full PFNL forward: head_impl='packed' + pfrb_impl='pallas_chain'-
    class packed path == the per-frame/XLA path, same param tree."""
    from pfnl_tpu.models.pfnl import PFNL

    x = jnp.asarray(rng.random((1, 7, 10, 14, 3)).astype(np.float32))
    m_ref = PFNL(num_blocks=2, nonlocal_impl="dense", pfrb_impl="xla",
                 head_impl="per_frame")
    m_pk = PFNL(num_blocks=2, nonlocal_impl="dense", pfrb_impl="pallas_pack",
                head_impl="packed")
    variables = m_ref.init(jax.random.PRNGKey(0), x)
    assert jax.tree.map(lambda a: a.shape, variables) == jax.tree.map(
        lambda a: a.shape, m_pk.init(jax.random.PRNGKey(0), x))
    ref = np.asarray(m_ref.apply(variables, x)["sr"])
    got = np.asarray(m_pk.apply(variables, x)["sr"])
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=2e-5)


def test_duf_conv3x3x3_tap_matches_xla(rng):
    """Tap-packed DUF dense-block conv vs the native lowering, both pad
    modes + gradient (interpret mode)."""
    from pfnl_tpu.ops.pallas.duf_dense import conv3x3x3_tap, _conv3x3x3_xla

    for (t, h, w, f, g, pad_t) in [(7, 12, 18, 64, 16, True),
                                   (7, 9, 13, 48, 16, False),
                                   (5, 16, 20, 80, 32, True)]:
        x = jnp.asarray(rng.standard_normal((2, t, h, w, f)).astype(np.float32)) * 0.1
        wk = jnp.asarray(rng.standard_normal((3, 3, 3, f, g)).astype(np.float32)) * 0.05
        ref = np.asarray(_conv3x3x3_xla(x, wk, pad_t))
        got = np.asarray(conv3x3x3_tap(x, wk, pad_t))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-5)

    x = jnp.asarray(rng.standard_normal((1, 5, 8, 9, 24)).astype(np.float32)) * 0.1
    wk = jnp.asarray(rng.standard_normal((3, 3, 3, 24, 16)).astype(np.float32)) * 0.05
    g1 = jax.grad(lambda a: jnp.sum(conv3x3x3_tap(a, wk, True) ** 2))(x)
    g2 = jax.grad(lambda a: jnp.sum(_conv3x3x3_xla(a, wk, True) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)


def test_duf_model_conv3d_impls_agree(rng):
    """DUF forward with per-conv Pallas dense-block convs == XLA forward."""
    from pfnl_tpu.models.duf import DUF

    x = jnp.asarray(rng.random((1, 7, 8, 12, 3)).astype(np.float32))
    m_x = DUF(num_frames=7, layers=16, conv3d_impl="xla")
    m_p = DUF(num_frames=7, layers=16, conv3d_impl="pallas")
    variables = m_x.init(jax.random.PRNGKey(0), x, is_train=False)
    # the moving_variance=0 init quirk makes untrained activations ~1e17
    # (numerically chaotic); compare in a sane regime: variance 1
    variables = dict(variables)
    variables["batch_stats"] = jax.tree.map(
        lambda a: jnp.ones_like(a), variables["batch_stats"])
    ref = np.asarray(m_x.apply(variables, x, is_train=False)["sr"])
    got = np.asarray(m_p.apply(variables, x, is_train=False)["sr"])
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_duf_fused_backbone_matches_xla(rng):
    """Whole-block fused dense-chain kernel (duf_block.py) == XLA forward
    bit-for-bit in f32 interpret mode, params tree identical."""
    from pfnl_tpu.models.duf import DUF

    x = jnp.asarray(rng.random((1, 7, 8, 12, 3)).astype(np.float32))
    m_x = DUF(num_frames=7, layers=16, conv3d_impl="xla")
    m_f = DUF(num_frames=7, layers=16, conv3d_impl="fused")
    vx = m_x.init(jax.random.PRNGKey(0), x, is_train=False)
    vf = m_f.init(jax.random.PRNGKey(0), x, is_train=False)
    assert jax.tree.map(lambda a: a.shape, vx) == jax.tree.map(
        lambda a: a.shape, vf)
    variables = dict(vx)
    variables["batch_stats"] = jax.tree.map(
        lambda a: jnp.ones_like(a), variables["batch_stats"])
    ref = np.asarray(m_x.apply(variables, x, is_train=False)["sr"])
    got = np.asarray(m_f.apply(variables, x, is_train=False)["sr"])
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_duf_fused_backbone_multi_tile(rng):
    """Same fused-vs-XLA check at a MULTI-row-tile geometry (h=20 ->
    3 tiles of rows=8 in f32): exercises the 3-slot DMA rings, the
    cross-tile RMW drain bounds, and halo reads of rows appended by a
    neighbouring tile — the paths a single-tile h=8 run never touches
    (an earlier drain-bounds bug produced a device error only at
    multi-tile sizes)."""
    from pfnl_tpu.models.duf import DUF

    x = jnp.asarray(rng.random((1, 7, 20, 12, 3)).astype(np.float32))
    m_x = DUF(num_frames=7, layers=16, conv3d_impl="xla")
    m_f = DUF(num_frames=7, layers=16, conv3d_impl="fused")
    variables = dict(m_x.init(jax.random.PRNGKey(0), x, is_train=False))
    variables["batch_stats"] = jax.tree.map(
        lambda a: jnp.ones_like(a), variables["batch_stats"])
    ref = np.asarray(m_x.apply(variables, x, is_train=False)["sr"])
    got = np.asarray(m_f.apply(variables, x, is_train=False)["sr"])
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
