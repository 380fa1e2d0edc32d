"""SPMC upscale-while-warp splat, phase-accumulation Pallas kernel.

Replaces the `jax.ops.segment_sum` splat in DRVSR's SPMC path
(reference imwarp_forward, modules/videosr_ops.py:399-503, called at
model/drvsr.py:145): TPU scatter serializes (27 ms/step at 720p batch
4), and the exact XLA phase-grouped shift-add rewrite
(ops/warp.py::forward_warp_local_spmc) is 2x slower still because XLA
materializes every one of the s^2*(2R+1)^2 = 400 masked-add terms in
HBM.  Here the whole accumulation for one frame runs in VMEM: each grid
step reads one LR frame + flow, computes the bilinear tap weights, and
accumulates the 400 statically-shifted masked terms into s^2 per-phase
canvases that are written out once.  The phase interleave + border fold
(the reference's index-clip semantics) stay in XLA where a transpose is
one cheap relayout.

Bounded flows only (|uv| <= max_disp, guaranteed by EasyFlow's
tanh-bounded two stages).  Forward-exact vs forward_warp; the gradient
is supplied analytically by ops/warp.py::forward_warp_spmc.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(im_ref, u_ref, v_ref, out_ref, pa_ref, pc_ref, ix_ref, *, h, w, s, r):
    p = r + 1
    nd = s * (2 * r + 1)  # distinct dy (= dx) offsets
    im = im_ref[0].astype(jnp.float32)
    u = u_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)

    gx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
    gy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)
    # reference coordinate scaling (videosr_ops.py:407-408; ratios equal)
    x = (gx + u) * s
    y = (gy + v) * s
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wa = (x0f + 1.0 - x) * (y0f + 1.0 - y)
    wb = (x0f + 1.0 - x) * (y - y0f)
    wc = (x - x0f) * (y0f + 1.0 - y)
    wd = (x - x0f) * (y - y0f)
    dx0 = (x0f - s * gx).astype(jnp.int32)
    dy0 = (y0f - s * gy).astype(jnp.int32)

    # Factor the 400 term masks: the row-matching image products depend
    # only on dy (nd distinct values) and the column masks only on dx, so
    # both are precomputed ONCE into VMEM scratch; each term is then two
    # scratch reads + an FMA + an in-place slice accumulate.  (A naive
    # value-level formulation keeps every shifted term live at once —
    # measured 110 MB scoped VMEM at 180x320, over the limit.)
    for di in range(nd):
        dy = di - s * r
        iy0 = (dy0 == dy).astype(jnp.float32)
        iy1 = (dy0 == dy - 1).astype(jnp.float32)
        pa_ref[di] = im * (wa * iy0 + wb * iy1)
        pc_ref[di] = im * (wc * iy0 + wd * iy1)
    for xi in range(nd + 1):
        ix_ref[xi] = (dx0 == xi - s * r - 1).astype(jnp.float32)

    zero = jnp.zeros((h + 2 * p, w + 2 * p), jnp.float32)
    for py in range(s):
        for px in range(s):
            out_ref[0, py * s + px] = zero
            for ey in range(-r, r + 1):
                dy = s * ey + py
                for ex in range(-r, r + 1):
                    dx = s * ex + px
                    m = (pa_ref[dy + s * r] * ix_ref[dx + s * r + 1]
                         + pc_ref[dy + s * r] * ix_ref[dx + s * r])
                    cur = out_ref[0, py * s + px,
                                  p + ey:p + ey + h, p + ex:p + ex + w]
                    out_ref[0, py * s + px,
                            p + ey:p + ey + h, p + ex:p + ex + w] = cur + m


@functools.partial(jax.jit, static_argnums=(2, 3))
def spmc_phases(im: jax.Array, uv: jax.Array, scale: int,
                max_disp: int = 2) -> jax.Array:
    """Per-phase splat canvases.

    im: [B, H, W] (single channel, squeezed); uv: [B, H, W, 2] with
    |uv| <= max_disp.  Returns float32 [B, scale^2, H+2p, W+2p]
    (p = max_disp + 1) where phase index py*scale+px holds the
    contributions to HR pixels (s*i + dy0_offset...) — the same layout
    forward_warp_local_spmc's `phases` stack uses, ready for its
    interleave + border fold tail."""
    b, h, w = im.shape
    s, r = int(scale), int(max_disp)
    p = r + 1
    return pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, s=s, r=r),
        grid=(b,),
        # uv split into u/v planes: a [.., W, 2] block pads its minor
        # dim 2 -> 128 lanes in VMEM (64x padded reads; at 720p sizes a
        # compile-time OOM — see bounded_splat.py)
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, s * s, h + 2 * p, w + 2 * p),
                               lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (b, s * s, h + 2 * p, w + 2 * p), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((s * (2 * r + 1), h, w), jnp.float32),      # pa
            pltpu.VMEM((s * (2 * r + 1), h, w), jnp.float32),      # pc
            pltpu.VMEM((s * (2 * r + 1) + 1, h, w), jnp.float32),  # ix
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.default_backend() == "cpu",
    )(im, jnp.asarray(uv)[..., 0], jnp.asarray(uv)[..., 1])
