"""Time the production split-PFRB kernels A and B separately at bench
shapes (batch 16, 180x320, C=64, bf16), plus the fused block, to locate
where the 23 ms/block goes."""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pfnl_tpu.ops.pallas.pfrb_split import (
    _kernel_a, _kernel_b, _specs, _pfrb_split_pallas,
    pad_to_split_layout,
)
from pfnl_tpu.ops.pallas.pfrb_fused import _pack_dydx as _pack_dy


def timeit(fn, *args, steps=20):
    floor_fn = jax.jit(lambda: jnp.float32(1.0))
    float(floor_fn())
    t0 = time.perf_counter()
    float(floor_fn())
    floor = time.perf_counter() - t0

    @jax.jit
    def chained(*a):
        def body(c, _):
            o = fn(a[0] + c.astype(a[0].dtype) * 1e-12, *a[1:])
            o = o[0] if isinstance(o, tuple) else o
            return jnp.mean(o.astype(jnp.float32)), None
        s, _ = lax.scan(body, jnp.float32(0.0), None, length=steps)
        return s

    float(chained(*args))
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        float(chained(*args))
        ts.append(time.perf_counter() - t0)
    return (min(ts) - floor) / steps


def make_data(batch=16, h=180, w=320, t=8, c=64, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.standard_normal((batch, t, h, w, c)).astype(np.float32) * 0.05, dtype)
    padded = pad_to_split_layout(feat, rows=16)
    p = [jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.05)
         for s in [(3, 3, c, c), (c,), (t, c, c), (c,), (3, 3, c, c), (3, 3, c, c), (c,)]]
    return padded, p


def run_a(padded, params, h, w, rows_a=16, tb=4):
    w1, b1, wfuse, bfuse, w2f, w2b, b2 = params
    n, t, hp, c2, c = padded.shape
    n_tsteps = t // tb
    dtype = padded.dtype
    wd1 = _pack_dy(w1.astype(dtype))
    wspec = lambda arr: pl.BlockSpec(arr.shape, lambda b, i, tt: (0,) * arr.ndim)
    b1r = b1.reshape(1, -1).astype(jnp.float32)
    bfr = bfuse.reshape(1, -1).astype(jnp.float32)
    wfuse_c = wfuse.astype(dtype).reshape(n_tsteps, tb * c, c)
    cur5, prev5, next5, cur4, _, _ = _specs(rows_a, tb, c2, c, hp)
    return pl.pallas_call(
        functools.partial(_kernel_a, rows=rows_a, c2=c2, h=h, w=w,
                          n_tsteps=n_tsteps, tb=tb),
        grid=(n, hp // rows_a, n_tsteps),
        in_specs=[prev5, cur5, next5, wspec(wd1), wspec(b1r), wspec(wfuse_c), wspec(bfr)],
        out_specs=(cur5, cur4),
        out_shape=(
            jax.ShapeDtypeStruct((n, t, hp, c2, c), dtype),
            jax.ShapeDtypeStruct((n, hp, c2, c), dtype),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(padded, padded, padded, wd1, b1r, wfuse_c, bfr)


def run_b(i1, base, padded, params, h, w, rows_b=16, tb=4):
    w1, b1, wfuse, bfuse, w2f, w2b, b2 = params
    n, t, hp, c2, c = padded.shape
    n_tsteps = t // tb
    dtype = padded.dtype
    wd2f = _pack_dy(w2f.astype(dtype))
    wd2b = _pack_dy(w2b.astype(dtype))
    wspec = lambda arr: pl.BlockSpec(arr.shape, lambda b, i, tt: (0,) * arr.ndim)
    b2r = b2.reshape(1, -1).astype(jnp.float32)
    cur5b, prev5b, next5b, cur4b, prev4b, next4b = _specs(rows_b, tb, c2, c, hp)
    return pl.pallas_call(
        functools.partial(_kernel_b, rows=rows_b, c2=c2, h=h, w=w,
                          n_tsteps=n_tsteps, tb=tb),
        grid=(n, hp // rows_b, n_tsteps),
        in_specs=[prev5b, cur5b, next5b, prev4b, cur4b, next4b, cur5b,
                  wspec(wd2f), wspec(wd2b), wspec(b2r)],
        out_specs=cur5b,
        out_shape=jax.ShapeDtypeStruct((n, t, hp, c2, c), dtype),
        scratch_shapes=[pltpu.VMEM((rows_b * c2, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(i1, i1, i1, base, base, base, padded, wd2f, wd2b, b2r)


if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    h, w, t = 180, 320, 8
    padded, params = make_data(batch, h, w, t)
    n, tt, hp, c2, c = padded.shape
    print(f"padded {padded.shape} ({padded.dtype})", flush=True)

    # HBM bytes and FLOPs per kernel
    act = n * tt * hp * c2 * c * 2
    base_b = n * hp * c2 * c * 2
    conv_fl = 2 * n * hp * c2 * 9 * c * c
    fuse_fl = 2 * n * hp * c2 * c * c
    a_bytes = act + act + base_b          # feat in (~1x + halos), i1 out, base out
    a_fl = tt * (conv_fl + fuse_fl)
    b_bytes = act * 3 + base_b + act      # i1 in, feat in, out + base in
    b_fl = tt * conv_fl + conv_fl

    dt_a = timeit(lambda p: run_a(p, params, h, w), padded)
    print(f"kernel A: {dt_a*1e3:.2f} ms  ({a_fl/dt_a/1e12:.1f} TFLOP/s, "
          f"{a_bytes/dt_a/1e9:.0f} GB/s min-traffic)", flush=True)

    i1, base = run_a(padded, params, h, w)
    dt_b = timeit(lambda i1, b, p: run_b(i1, b, p, params, h, w), i1, base, padded)
    print(f"kernel B: {dt_b*1e3:.2f} ms  ({b_fl/dt_b/1e12:.1f} TFLOP/s, "
          f"{b_bytes/dt_b/1e9:.0f} GB/s min-traffic)", flush=True)

    dt = timeit(lambda p: _pfrb_split_pallas(p, params, h, w, 16, 16, tb=4), padded)
    print(f"block A+B: {dt*1e3:.2f} ms", flush=True)
