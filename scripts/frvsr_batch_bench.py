"""Dissect the FRVSR streaming batch-scaling regression (VERDICT r2 weak
item 6): streaming fps was 104.7 at batch 4 but 39.8 at batch 8.

Measures (scan-chained, relay-aware):
  * end-to-end streaming fps at batches 1/2/4/8;
  * per-component time at b4 vs b8: flow net, HR warp+s2d fold, trunk
    (first=False), to localize the non-linearity.

Run from /root/repo:  python scripts/frvsr_batch_bench.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from pfnl_tpu.models.frvsr import FRVSR


def timeit(fn, *args, steps=10):
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


def stream_fps(batch, h=180, w=320, frames=10, steps=5, dtype=jnp.bfloat16):
    m = FRVSR(dtype=dtype)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, frames, h, w, 3), np.float32))
    variables = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x))()

    @jax.jit
    def chained(variables, x):
        def frame_body(carry, xt):
            xp, est = carry
            sr = m.apply(variables, xt, xp, est, method=m.step)
            return (xt, sr), jnp.mean(sr.astype(jnp.float32))

        def body(c, _):
            x0 = x[:, 0] + c * 1e-12
            sr0 = m.apply(variables, x0, method=m.step)
            _, means = lax.scan(frame_body, (x0, sr0), jnp.moveaxis(x[:, 1:], 1, 0))
            return jnp.mean(means), None

        s, _ = lax.scan(body, jnp.float32(0.0), None, length=steps)
        return s

    floor_fn = jax.jit(lambda: jnp.float32(1.0))
    float(floor_fn())
    t0 = time.perf_counter()
    float(floor_fn())
    floor = time.perf_counter() - t0
    float(chained(variables, x))
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        float(chained(variables, x))
        ts.append(time.perf_counter() - t0)
    dt = (min(ts) - floor) / steps
    fps = batch * frames / dt
    print(f"frvsr streaming b{batch}: {fps:.1f} fps ({dt*1e3/frames:.1f} ms/frame-step)",
          flush=True)
    return fps


def components(batch, h=180, w=320, dtype=jnp.bfloat16):
    m = FRVSR(dtype=dtype)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, 2, h, w, 3), np.float32))
    variables = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x))()
    xt = x[:, 1].astype(dtype)
    xp = x[:, 0].astype(dtype)
    est = jnp.asarray(rng.random((batch, h * 4, w * 4, 3), np.float32), dtype)
    uv = jnp.asarray(rng.random((batch, h, w, 2), np.float32) - 0.5, dtype)

    flow = lambda xt, xp, c: m.apply(variables, xt + c.astype(dtype) * 1e-12, xp,
                                     method=lambda mm, a, b: mm.flownet(a, b))
    dt = timeit(flow, xt, xp)
    print(f"  b{batch} flow:        {dt*1e3:7.2f} ms", flush=True)

    warp = lambda uv, est, c: m.apply(variables, uv + c.astype(dtype) * 1e-12, est,
                                      method=lambda mm, a, b: mm._upscale_warp(a, b))
    dt = timeit(warp, uv, est)
    print(f"  b{batch} upscale_warp:{dt*1e3:7.2f} ms", flush=True)

    inp = jnp.concatenate([xt, jnp.zeros((batch, h, w, 48), dtype)], axis=-1)
    trunk = lambda inp, c: m.apply(variables, inp + c.astype(dtype) * 1e-12,
                                   method=lambda mm, a: mm._trunk(a, first=False))
    dt = timeit(trunk, inp)
    print(f"  b{batch} trunk:       {dt*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "fps"):
        for b in (1, 2, 4, 8):
            stream_fps(b)
    if which in ("all", "comp"):
        for b in (4, 8):
            components(b)
