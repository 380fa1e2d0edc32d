"""Golden tests for warps and resize against numpy oracles."""

import numpy as np
import pytest

from pfnl_tpu.ops.warp import backward_warp, forward_warp
from pfnl_tpu.ops.resize import resize_bilinear, resize_bicubic, resize_images

pytestmark = pytest.mark.quick


def _np_backward_warp(im, uv):
    """Literal numpy transcription of imwarp_backward
    (modules/videosr_ops.py:306-396), same-size case."""
    b, h, w, c = im.shape
    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    out = np.zeros_like(im)
    for bi in range(b):
        x = gx + uv[bi, :, :, 0]
        y = gy + uv[bi, :, :, 1]
        x0 = np.floor(x).astype(int)
        y0 = np.floor(y).astype(int)
        x1, y1 = x0 + 1, y0 + 1
        wa = (x1 - x) * (y1 - y)
        wb = (x1 - x) * (y - y0)
        wc = (x - x0) * (y1 - y)
        wd = (x - x0) * (y - y0)
        x0c, x1c = np.clip(x0, 0, w - 1), np.clip(x1, 0, w - 1)
        y0c, y1c = np.clip(y0, 0, h - 1), np.clip(y1, 0, h - 1)
        out[bi] = (
            wa[..., None] * im[bi, y0c, x0c]
            + wb[..., None] * im[bi, y1c, x0c]
            + wc[..., None] * im[bi, y0c, x1c]
            + wd[..., None] * im[bi, y1c, x1c]
        )
    return np.clip(out, 0.0, 1.0)


def _np_forward_warp(im, uv, out_h, out_w):
    """Literal numpy transcription of imwarp_forward
    (modules/videosr_ops.py:399-503)."""
    b, h, w, c = im.shape
    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    out = np.zeros((b, out_h, out_w, c), im.dtype)
    for bi in range(b):
        x = (gx + uv[bi, :, :, 0]) * (out_h / h)  # reference's swapped-ratio quirk
        y = (gy + uv[bi, :, :, 1]) * (out_w / w)
        x0 = np.floor(x).astype(int)
        y0 = np.floor(y).astype(int)
        x1, y1 = x0 + 1, y0 + 1
        wa = (x1 - x) * (y1 - y)
        wb = (x1 - x) * (y - y0)
        wc = (x - x0) * (y1 - y)
        wd = (x - x0) * (y - y0)
        x0c, x1c = np.clip(x0, 0, out_w - 1), np.clip(x1, 0, out_w - 1)
        y0c, y1c = np.clip(y0, 0, out_h - 1), np.clip(y1, 0, out_h - 1)
        for (wt, yy, xx) in [(wa, y0c, x0c), (wb, y1c, x0c), (wc, y0c, x1c), (wd, y1c, x1c)]:
            np.add.at(out[bi], (yy.ravel(), xx.ravel()),
                      (wt[..., None] * im[bi]).reshape(-1, c))
    return out


def test_backward_warp_zero_flow_is_identity(rng):
    im = rng.random((2, 6, 7, 3)).astype(np.float32)
    uv = np.zeros((2, 6, 7, 2), np.float32)
    np.testing.assert_allclose(np.asarray(backward_warp(im, uv)), im, atol=1e-6)


def test_backward_warp_matches_numpy(rng):
    im = rng.random((2, 8, 9, 2)).astype(np.float32)
    uv = (rng.random((2, 8, 9, 2)).astype(np.float32) - 0.5) * 3.0
    got = np.asarray(backward_warp(im, uv))
    ref = _np_backward_warp(im, uv)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_backward_warp_integer_shift(rng):
    im = rng.random((1, 5, 5, 1)).astype(np.float32)
    uv = np.zeros((1, 5, 5, 2), np.float32)
    uv[..., 0] = 1.0  # sample from x+1 (shift content left)
    got = np.asarray(backward_warp(im, uv))
    np.testing.assert_allclose(got[0, :, :-1, 0], im[0, :, 1:, 0], atol=1e-6)


def test_forward_warp_matches_numpy_same_size(rng):
    im = rng.random((2, 6, 7, 2)).astype(np.float32)
    uv = (rng.random((2, 6, 7, 2)).astype(np.float32) - 0.5) * 2.5
    got = np.asarray(forward_warp(im, uv, (6, 7)))
    ref = _np_forward_warp(im, uv, 6, 7)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_forward_warp_spmc_upscale(rng):
    """DRVSR's upscale-while-warping: LR -> x4 HR grid (model/drvsr.py:145)."""
    im = rng.random((1, 4, 5, 1)).astype(np.float32)
    uv = (rng.random((1, 4, 5, 2)).astype(np.float32) - 0.5) * 1.5
    got = np.asarray(forward_warp(im, uv, (16, 20)))
    ref = _np_forward_warp(im, uv, 16, 20)
    np.testing.assert_allclose(got, ref, atol=1e-5)
    # mass conservation: splatting preserves total intensity
    np.testing.assert_allclose(got.sum(), im.sum(), rtol=1e-5)


def test_forward_warp_zero_flow_upscale_is_zero_upsampling_like(rng):
    im = np.ones((1, 3, 3, 1), np.float32)
    got = np.asarray(forward_warp(im, np.zeros((1, 3, 3, 2), np.float32), (6, 6)))
    # integer target coords -> each source pixel lands on exactly one cell
    assert got.sum() == pytest.approx(9.0)
    np.testing.assert_allclose(got[0, ::2, ::2, 0], 1.0)


def test_forward_warp_is_differentiable(rng):
    import jax
    import jax.numpy as jnp

    im = jnp.asarray(rng.random((1, 4, 4, 1)).astype(np.float32))
    uv = jnp.asarray((rng.random((1, 4, 4, 2)).astype(np.float32) - 0.5))
    g = jax.grad(lambda u: forward_warp(im, u, (4, 4)).sum())(uv)
    assert np.all(np.isfinite(np.asarray(g)))


def _np_resize_1d_tf1(x, n_out, kernel):
    n_in = x.shape[0]
    out = np.zeros((n_out,) + x.shape[1:])
    scale = n_in / n_out
    for i in range(n_out):
        src = i * scale
        base = int(np.floor(src))
        if kernel == "bilinear":
            taps = range(0, 2)
        else:
            taps = range(-1, 3)
        for t in taps:
            idx = base + t
            d = abs(src - idx)
            if kernel == "bilinear":
                wgt = max(0.0, 1.0 - d)
            else:
                a = -0.75
                if d <= 1:
                    wgt = (a + 2) * d**3 - (a + 3) * d**2 + 1
                elif d < 2:
                    wgt = a * d**3 - 5 * a * d**2 + 8 * a * d - 4 * a
                else:
                    wgt = 0.0
            out[i] += wgt * x[np.clip(idx, 0, n_in - 1)]
    return out


@pytest.mark.parametrize("kernel", ["bilinear", "bicubic"])
def test_resize_matches_tf1_oracle(rng, kernel):
    x = rng.random((6, 5, 2)).astype(np.float32)  # [H,W,C]
    fn = resize_bilinear if kernel == "bilinear" else resize_bicubic
    got = np.asarray(fn(x[None], (24, 20)))[0]
    ref = _np_resize_1d_tf1(x, 24, kernel)          # rows
    ref = _np_resize_1d_tf1(ref.transpose(1, 0, 2), 20, kernel).transpose(1, 0, 2)  # cols
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_resize_identity(rng):
    x = rng.random((1, 8, 8, 3)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(resize_bilinear(x, (8, 8))), x, atol=1e-6)
    np.testing.assert_allclose(np.asarray(resize_bicubic(x, (8, 8))), x, atol=1e-6)


def test_resize_5d(rng):
    x = rng.random((2, 3, 4, 4, 3)).astype(np.float32)
    y = np.asarray(resize_images(x, (8, 8), "bilinear"))
    assert y.shape == (2, 3, 8, 8, 3)
    y0 = np.asarray(resize_images(x[:, 0], (8, 8), "bilinear"))
    np.testing.assert_allclose(y[:, 0], y0, atol=1e-6)


def test_forward_warp_local_matches_segment_sum(rng):
    """Scatter-free bounded splat == the segment-sum splat (incl. the
    accumulate-at-border clipping), |uv| <= 1."""
    import jax.numpy as jnp
    from pfnl_tpu.ops.warp import forward_warp, forward_warp_local

    im = jnp.asarray(rng.random((2, 13, 17, 3)).astype(np.float32))
    uv = jnp.asarray((rng.random((2, 13, 17, 2)) * 2 - 1).astype(np.float32))
    ref = np.asarray(forward_warp(im, uv))
    got = np.asarray(forward_warp_local(im, uv, max_disp=1))
    np.testing.assert_allclose(got, ref, atol=1e-5)

    # exact +/-1 integer flow (floor boundary) and 5-D folding
    uv1 = jnp.asarray(rng.integers(-1, 2, (2, 13, 17, 2)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(forward_warp_local(im, uv1, 1)),
        np.asarray(forward_warp(im, uv1)), atol=1e-5)
    im5 = im.reshape(1, 2, 13, 17, 3)
    uv5 = uv.reshape(1, 2, 13, 17, 2)
    np.testing.assert_allclose(
        np.asarray(forward_warp_local(im5, uv5, 1)),
        np.asarray(forward_warp(im5, uv5)), atol=1e-5)


def test_forward_warp_local_r2(rng):
    """max_disp=2 local splat (the EasyFlow bound) == segment-sum splat."""
    import jax.numpy as jnp
    from pfnl_tpu.ops.warp import forward_warp, forward_warp_local

    im = jnp.asarray(rng.random((2, 11, 15, 1)).astype(np.float32))
    uv = jnp.asarray((rng.random((2, 11, 15, 2)) * 4 - 2).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(forward_warp_local(im, uv, max_disp=2)),
        np.asarray(forward_warp(im, uv)), atol=1e-5)


def test_forward_warp_local_spmc(rng):
    """Phase-grouped SPMC local splat == segment-sum SPMC splat."""
    import jax.numpy as jnp
    from pfnl_tpu.ops.warp import forward_warp, forward_warp_local_spmc

    im = jnp.asarray(rng.random((2, 9, 13, 1)).astype(np.float32))
    uv = jnp.asarray((rng.random((2, 9, 13, 2)) * 4 - 2).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(forward_warp_local_spmc(im, uv, 4, max_disp=2)),
        np.asarray(forward_warp(im, uv, (36, 52))), atol=1e-5)


@pytest.mark.slow
def test_forward_warp_spmc_kernel_matches_segment(rng):
    """Pallas phase-splat (forward_warp_spmc) == segment-sum splat for
    bounded flows, including values at the |uv|<=2 bound and border
    pixels whose taps clip (interpret mode on CPU)."""
    from pfnl_tpu.ops.warp import forward_warp_spmc

    im = rng.random((2, 6, 9, 1)).astype(np.float32)
    uv = (rng.random((2, 6, 9, 2)).astype(np.float32) - 0.5) * 4.0
    uv[0, 0, 0] = [2.0, -2.0]  # exact bound
    uv[0, -1, -1] = [-2.0, 2.0]
    got = np.asarray(forward_warp_spmc(im, uv, 4))
    ref = np.asarray(forward_warp(im, uv, (24, 36)))
    np.testing.assert_allclose(got, ref, atol=1e-5)
    # 5-D fold
    got5 = np.asarray(forward_warp_spmc(im[None], uv[None], 4))
    assert got5.shape == (1, 2, 24, 36, 1)
    np.testing.assert_allclose(got5[0], ref, atol=1e-5)


@pytest.mark.slow
def test_forward_warp_spmc_gradients_match_segment(rng):
    """The analytic gather adjoint == segment_sum's autodiff adjoint for
    both the image and the flow."""
    import jax
    import jax.numpy as jnp
    from pfnl_tpu.ops.warp import forward_warp_spmc

    im = jnp.asarray(rng.random((1, 5, 6, 1)).astype(np.float32))
    uv = jnp.asarray((rng.random((1, 5, 6, 2)).astype(np.float32) - 0.5) * 3.5)
    tgt = jnp.asarray(rng.random((1, 20, 24, 1)).astype(np.float32))

    loss_new = lambda i, f: jnp.sum((forward_warp_spmc(i, f, 4) - tgt) ** 2)
    loss_ref = lambda i, f: jnp.sum((forward_warp(i, f, (20, 24)) - tgt) ** 2)
    gi_new, gf_new = jax.grad(loss_new, argnums=(0, 1))(im, uv)
    gi_ref, gf_ref = jax.grad(loss_ref, argnums=(0, 1))(im, uv)
    np.testing.assert_allclose(np.asarray(gi_new), np.asarray(gi_ref),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(gf_new), np.asarray(gf_ref),
                               atol=1e-4)


def test_forward_warp_local_pallas_kernel(rng):
    """Single-pass Pallas bounded splat (the default impl) == the XLA
    chained-add rewrite == segment-sum splat, multi-channel, including
    exact integer flows at the bound and border pixels (interpret mode
    on CPU)."""
    import jax.numpy as jnp
    from pfnl_tpu.ops.warp import forward_warp, forward_warp_local

    im = jnp.asarray(rng.random((2, 13, 17, 3)).astype(np.float32))
    uv = np.asarray((rng.random((2, 13, 17, 2)) * 2 - 1), np.float32)
    uv[0, 0, 0] = [1.0, -1.0]  # exact bound at a corner
    uv[1, -1, -1] = [-1.0, 1.0]
    uv = jnp.asarray(uv)
    ref = np.asarray(forward_warp(im, uv))
    got_p = np.asarray(forward_warp_local(im, uv, 1, impl="pallas"))
    got_x = np.asarray(forward_warp_local(im, uv, 1, impl="xla"))
    np.testing.assert_allclose(got_p, ref, atol=1e-5)
    np.testing.assert_allclose(got_p, got_x, atol=1e-6)

    # r=2 (the EasyFlow bound) and single-channel
    im1 = jnp.asarray(rng.random((2, 11, 15, 1)).astype(np.float32))
    uv2 = jnp.asarray((rng.random((2, 11, 15, 2)) * 4 - 2).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(forward_warp_local(im1, uv2, 2, impl="pallas")),
        np.asarray(forward_warp(im1, uv2)), atol=1e-5)

    # 5-D folding and bf16 dtype preservation
    im5 = im.reshape(1, 2, 13, 17, 3).astype(jnp.bfloat16)
    uv5 = uv.reshape(1, 2, 13, 17, 2)
    out5 = forward_warp_local(im5, uv5, 1, impl="pallas")
    assert out5.shape == (1, 2, 13, 17, 3) and out5.dtype == jnp.bfloat16


def test_forward_warp_local_pallas_gradients(rng):
    """The analytic gather adjoint of the Pallas bounded splat == the XLA
    rewrite's autodiff adjoint for both image and flow."""
    import jax
    import jax.numpy as jnp
    from pfnl_tpu.ops.warp import forward_warp_local

    im = jnp.asarray(rng.random((2, 7, 9, 3)).astype(np.float32))
    uv = jnp.asarray((rng.random((2, 7, 9, 2)).astype(np.float32) - 0.5) * 1.8)
    tgt = jnp.asarray(rng.random((2, 7, 9, 3)).astype(np.float32))

    loss_p = lambda i, f: jnp.sum((forward_warp_local(i, f, 1, impl="pallas") - tgt) ** 2)
    loss_x = lambda i, f: jnp.sum((forward_warp_local(i, f, 1, impl="xla") - tgt) ** 2)
    gi_p, gf_p = jax.grad(loss_p, argnums=(0, 1))(im, uv)
    gi_x, gf_x = jax.grad(loss_x, argnums=(0, 1))(im, uv)
    np.testing.assert_allclose(np.asarray(gi_p), np.asarray(gi_x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gf_p), np.asarray(gf_x), atol=1e-4)


def test_backward_warp_local_matches_gather(rng):
    """Gather-free bounded backward warp == the gather warp (incl. the
    index-clip border semantics, which edge replication reproduces), at
    r=1 and r=2, exact integer flows, 5-D folding, and gradients."""
    import jax
    import jax.numpy as jnp
    from pfnl_tpu.ops.warp import backward_warp, backward_warp_local

    im = jnp.asarray(rng.random((2, 13, 17, 3)).astype(np.float32))
    for r in (1, 2):
        uv = jnp.asarray((rng.random((2, 13, 17, 2)) * 2 - 1).astype(np.float32)) * r
        ref = np.asarray(backward_warp(im, uv))
        got = np.asarray(backward_warp_local(im, uv, max_disp=r))
        np.testing.assert_allclose(got, ref, atol=1e-5)

        uvi = jnp.asarray(
            rng.integers(-r, r + 1, (2, 13, 17, 2)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(backward_warp_local(im, uvi, r)),
            np.asarray(backward_warp(im, uvi)), atol=1e-5)

        # gradients w.r.t. image AND flow match the gather warp's autodiff
        gr = jax.grad(lambda i, u: jnp.sum(backward_warp(i, u) ** 2),
                      argnums=(0, 1))(im, uv)
        gl = jax.grad(
            lambda i, u: jnp.sum(backward_warp_local(i, u, r) ** 2),
            argnums=(0, 1))(im, uv)
        np.testing.assert_allclose(np.asarray(gl[0]), np.asarray(gr[0]),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(gl[1]), np.asarray(gr[1]),
                                   atol=1e-4)

    im5 = im.reshape(1, 2, 13, 17, 3)
    uv = jnp.asarray((rng.random((2, 13, 17, 2)) * 2 - 1).astype(np.float32))
    uv5 = uv.reshape(1, 2, 13, 17, 2)
    np.testing.assert_allclose(
        np.asarray(backward_warp_local(im5, uv5, 1)),
        np.asarray(backward_warp(im5, uv5)), atol=1e-5)
