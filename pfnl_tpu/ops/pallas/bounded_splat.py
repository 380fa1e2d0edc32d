"""Bounded same-size forward splat, single-pass Pallas kernel.

FRVSR forward-warps the previous SR frame at HR resolution every
recurrent step (reference model/frvsr.py:98-104); its flow is
tanh-bounded and unscaled by the HR resize, so |uv| <= 1 and the splat
is local.  The XLA rewrite (ops/warp.py::forward_warp_local) expresses
the splat as 16 masked shift-adds into a padded canvas, but XLA executes
the chained `.at[].add` as serialized full-canvas read-modify-writes in
HBM — measured 17.4 ms of the 35 ms FRVSR streaming step at 720p b4
(scripts/frvsr_batch_bench.py).  Here the whole accumulation for one
frame runs in VMEM: one grid step reads the frame + flow, computes the
bilinear taps ONCE (channel-shared), and accumulates the 16
statically-shifted masked terms per channel into a padded canvas that is
written out once.  The border fold (the reference's index-clip
semantics, modules/videosr_ops.py:455-466) stays in XLA.

Bounded flows only (|uv| <= max_disp).  Forward-exact vs
forward_warp_local; the gradient is supplied analytically by
ops/warp.py (gather-based adjoint, no scatter in either direction).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(im_ref, u_ref, v_ref, out_ref, *, h, w, c, r):
    p = r + 1
    u = u_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)

    gx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
    gy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)
    x = gx + u
    y = gy + v
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wa = (x0f + 1.0 - x) * (y0f + 1.0 - y)
    wb = (x0f + 1.0 - x) * (y - y0f)
    wc = (x - x0f) * (y0f + 1.0 - y)
    wd = (x - x0f) * (y - y0f)
    dx0 = x0f - gx  # integer-valued f32; compare in f32 (cheaper relayout)
    dy0 = y0f - gy

    for ci in range(c):
        out_ref[0, ci] = jnp.zeros((h + 2 * p, w + 2 * p), jnp.float32)
    # 16 (dy,dx) terms; the mask is channel-shared, computed once per term.
    for dy in range(-r, r + 2):
        iy0 = (dy0 == dy).astype(jnp.float32)
        iy1 = (dy0 == dy - 1).astype(jnp.float32)
        qa = wa * iy0 + wb * iy1
        qc = wc * iy0 + wd * iy1
        for dx in range(-r, r + 2):
            ix0 = (dx0 == dx).astype(jnp.float32)
            ix1 = (dx0 == dx - 1).astype(jnp.float32)
            m = qa * ix0 + qc * ix1
            for ci in range(c):
                cur = out_ref[0, ci, p + dy:p + dy + h, p + dx:p + dx + w]
                out_ref[0, ci, p + dy:p + dy + h, p + dx:p + dx + w] = (
                    cur + im_ref[0, ci].astype(jnp.float32) * m)


@functools.partial(jax.jit, static_argnums=(2,))
def bounded_splat_canvas(im: jax.Array, uv: jax.Array,
                         max_disp: int = 1) -> jax.Array:
    """Padded splat canvas for bounded same-size forward warps.

    im: [B, C, H, W] (channel-major planes); uv: [B, H, W, 2] with
    |uv| <= max_disp.  Returns float32 [B, C, H+2p, W+2p] (p = max_disp
    + 1), ready for the border fold (= the reference's index clipping,
    modules/videosr_ops.py:455-466) in XLA.

    uv is split into u/v planes before the kernel: a [.., W, 2] block
    pads its minor dim 2 to 128 lanes in VMEM — 236 MB per buffer at
    720p, a compile-time OOM; [.., H, W] planes tile cleanly."""
    b, c, h, w = im.shape
    r = int(max_disp)
    p = r + 1
    uf = jnp.asarray(uv)
    return pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, c=c, r=r),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, c, h + 2 * p, w + 2 * p),
                               lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (b, c, h + 2 * p, w + 2 * p), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=jax.default_backend() == "cpu",
    )(im, uf[..., 0], uf[..., 1])
