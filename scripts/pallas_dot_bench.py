"""Measure Mosaic dot throughput for the PFRB's shapes:
small-N (64) matmuls with K in {64, 576} on VMEM-resident data."""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, steps=30):
    floor_fn = jax.jit(lambda: jnp.float32(1.0))
    float(floor_fn())
    t0 = time.perf_counter()
    float(floor_fn())
    floor = time.perf_counter() - t0

    @jax.jit
    def chained(*a):
        def body(c, _):
            return jnp.mean(fn(a[0] + c.astype(a[0].dtype) * 1e-12, *a[1:]).astype(jnp.float32)), None
        s, _ = lax.scan(body, jnp.float32(0.0), None, length=steps)
        return s

    float(chained(*args))
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        float(chained(*args))
        ts.append(time.perf_counter() - t0)
    return (min(ts) - floor) / steps


def dot_kernel(x_ref, w_ref, o_ref, *, reps):
    x = x_ref[:]
    acc = jnp.zeros((x.shape[0], w_ref.shape[-1]), jnp.float32)
    for r in range(reps):
        acc += jax.lax.dot_general(
            x, w_ref[r], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[:] = acc.astype(o_ref.dtype)


def case(m, k, n, reps, grid, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((grid, m, k)).astype(np.float32), dtype)
    w = jnp.asarray(rng.standard_normal((reps, k, n)).astype(np.float32), dtype)

    def fn(x, w):
        return pl.pallas_call(
            functools.partial(dot_kernel, reps=reps),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((1, m, k), lambda i: (i, 0, 0)),
                pl.BlockSpec((reps, k, n), lambda i: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, m, n), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((grid, m, n), dtype),
        )(x.reshape(grid, m, k), w)

    dt = timeit(fn, x, w)
    fl = 2 * m * k * n * reps * grid
    print(f"M={m} K={k} N={n} reps={reps} grid={grid}: {dt*1e3:.3f} ms -> "
          f"{fl/dt/1e12:.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("k64", "all"):
        case(m=1932, k=64, n=64, reps=9, grid=64)
    if which in ("k576", "all"):
        case(m=1932, k=576, n=64, reps=1, grid=64)
    if which in ("k64n128", "all"):
        case(m=1932, k=64, n=128, reps=9, grid=64)
    if which in ("k128", "all"):
        case(m=1932, k=128, n=64, reps=5, grid=64)
