"""A/B the bounded forward splat (`forward_warp_local`) implementations.

The round-3 FRVSR dissection pinned `_upscale_warp` at 17.4 ms (b4) /
21.3 ms (b8) of the 35/63 ms streaming step — ~½ resp. ⅓ of the whole
model.  The current implementation accumulates 16 masked shifts into a
canvas via chained `.at[].add` (dynamic-update-slice), which XLA executes
as a serialized read-modify-write chain over the full canvas.

Variants measured here (FRVSR HR geometry and the LR geometry the other
flow families use):

  current   ops.warp.forward_warp_local (DUS chain)
  padsum    the same 16 terms as a functional sum of statically-padded
            products — a pure stencil XLA can fuse into one loop
  factored  padsum with the row/column mask factorization the SPMC
            Pallas kernel uses (pa/pc per dy, ix per dx)

Run from /root/repo:  python scripts/warp_local_bench.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from pfnl_tpu.ops.warp import forward_warp_local


def timeit(fn, *args, steps=20):
    floor_fn = jax.jit(lambda: jnp.float32(1.0))
    float(floor_fn())
    t0 = time.perf_counter()
    float(floor_fn())
    floor = time.perf_counter() - t0

    @jax.jit
    def chained(*a):
        def body(c, _):
            return jnp.mean(fn(*a, c).astype(jnp.float32)), None

        s, _ = lax.scan(body, jnp.float32(0.0), None, length=steps)
        return s

    float(chained(*args))
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        float(chained(*args))
        ts.append(time.perf_counter() - t0)
    return (min(ts) - floor) / steps


def _taps(im, uv, r):
    uvf = uv.astype(jnp.float32)
    b, h, w, c = im.shape
    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    x = gx + uvf[..., 0]
    y = gy + uvf[..., 1]
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wa = (x0f + 1.0 - x) * (y0f + 1.0 - y)
    wb = (x0f + 1.0 - x) * (y - y0f)
    wc = (x - x0f) * (y0f + 1.0 - y)
    wd = (x - x0f) * (y - y0f)
    dx0 = (x0f - gx).astype(jnp.int32)
    dy0 = (y0f - gy).astype(jnp.int32)
    return wa, wb, wc, wd, dx0, dy0


def _fold(canvas, h, w, p):
    mid = canvas[:, p:p + h]
    mid = mid.at[:, 0].add(canvas[:, :p].sum(axis=1))
    mid = mid.at[:, h - 1].add(canvas[:, p + h:].sum(axis=1))
    out = mid[:, :, p:p + w]
    out = out.at[:, :, 0].add(mid[:, :, :p].sum(axis=2))
    out = out.at[:, :, w - 1].add(mid[:, :, p + w:].sum(axis=2))
    return out


def forward_warp_local_padsum(im, uv, max_disp=1):
    b, h, w, c = im.shape
    r = int(max_disp)
    p = r + 1
    wa, wb, wc, wd, dx0, dy0 = _taps(im, uv, r)
    imf = im.astype(jnp.float32)
    canvas = None
    for dy in range(-r, r + 2):
        iy0 = (dy0 == dy).astype(jnp.float32)
        iy1 = (dy0 == dy - 1).astype(jnp.float32)
        for dx in range(-r, r + 2):
            ix0 = (dx0 == dx).astype(jnp.float32)
            ix1 = (dx0 == dx - 1).astype(jnp.float32)
            m = (wa * iy0 * ix0 + wb * iy1 * ix0
                 + wc * iy0 * ix1 + wd * iy1 * ix1)
            term = jnp.pad(imf * m[..., None],
                           ((0, 0), (p + dy, p - dy), (p + dx, p - dx), (0, 0)))
            canvas = term if canvas is None else canvas + term
    return _fold(canvas, h, w, p).astype(im.dtype)


def forward_warp_local_factored(im, uv, max_disp=1):
    b, h, w, c = im.shape
    r = int(max_disp)
    p = r + 1
    wa, wb, wc, wd, dx0, dy0 = _taps(im, uv, r)
    imf = im.astype(jnp.float32)
    pa, pc, ix0s, ix1s = {}, {}, {}, {}
    for dy in range(-r, r + 2):
        iy0 = (dy0 == dy).astype(jnp.float32)
        iy1 = (dy0 == dy - 1).astype(jnp.float32)
        pa[dy] = imf * (wa * iy0 + wb * iy1)[..., None]
        pc[dy] = imf * (wc * iy0 + wd * iy1)[..., None]
    for dx in range(-r, r + 2):
        ix0s[dx] = (dx0 == dx).astype(jnp.float32)[..., None]
        ix1s[dx] = (dx0 == dx - 1).astype(jnp.float32)[..., None]
    canvas = None
    for dy in range(-r, r + 2):
        for dx in range(-r, r + 2):
            term = jnp.pad(pa[dy] * ix0s[dx] + pc[dy] * ix1s[dx],
                           ((0, 0), (p + dy, p - dy), (p + dx, p - dx), (0, 0)))
            canvas = term if canvas is None else canvas + term
    return _fold(canvas, h, w, p).astype(im.dtype)


def main():
    rng = np.random.default_rng(0)
    geoms = [
        ("FRVSR HR b4", 4, 720, 1280, 3, 1),
        ("FRVSR HR b8", 8, 720, 1280, 3, 1),
        ("LR b16x5f r2", 80, 180, 320, 1, 2),
    ]
    impls = [
        ("xla DUS ", lambda im, uv, r: forward_warp_local(im, uv, r, impl="xla")),
        ("padsum  ", forward_warp_local_padsum),
        ("factored", forward_warp_local_factored),
        ("pallas  ", lambda im, uv, r: forward_warp_local(im, uv, r, impl="pallas")),
    ]
    for name, b, h, w, c, r in geoms:
        im = jnp.asarray(rng.random((b, h, w, c), np.float32), jnp.bfloat16)
        uv = jnp.asarray(
            np.tanh(rng.standard_normal((b, h, w, 2))).astype(np.float32) * r,
            jnp.bfloat16)
        ref = np.asarray(forward_warp_local(im, uv, r, impl="xla"), np.float32)
        print(f"== {name} [{b},{h},{w},{c}] r={r}")
        for iname, fn in impls:
            got = np.asarray(fn(im, uv, r), np.float32)
            err = np.abs(got - ref).max()
            dt = timeit(fn, im, uv, r)
            print(f"  {iname}: {dt*1e3:7.2f} ms   max|err|={err:.2e}",
                  flush=True)


if __name__ == "__main__":
    main()
