"""Microbenchmark primitives on the TPU (relay-aware timing)."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


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


def conv_case(c_in, c_out, dtype, n=7, h=180, w=320, k=3):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((n, h, w, c_in), np.float32), dtype)
    wk = jnp.asarray(rng.random((k, k, c_in, c_out), np.float32), dtype)
    conv = lambda x, w, c: lax.conv_general_dilated(
        x + c.astype(x.dtype) * 1e-12, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    dt = timeit(conv, x, wk)
    fl = 2 * k * k * c_in * c_out * n * h * w
    print(f"{k}x{k} conv {c_in}->{c_out} [{n},{h},{w}] {dtype.__name__}: "
          f"{dt*1e3:.3f} ms -> {fl/dt/1e12:.1f} TFLOP/s", flush=True)


def einsum_case(dtype):
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.random((1, 7, 180, 320, 64), np.float32), dtype)
    wf = jnp.asarray(rng.random((7, 64, 64), np.float32), dtype)
    f = lambda i1, wf, c: jnp.einsum("nthwc,tcd->nhwd", i1 + c.astype(i1.dtype) * 1e-12, wf)
    dt = timeit(f, i1, wf)
    print(f"fuse einsum {dtype.__name__}: {dt*1e3:.3f} ms -> "
          f"{2*448*64*180*320/dt/1e12:.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    case = sys.argv[1] if len(sys.argv) > 1 else "all"
    if case in ("conv64", "all"):
        conv_case(64, 64, jnp.bfloat16)
    if case in ("conv64f32", "all"):
        conv_case(64, 64, jnp.float32)
    if case in ("conv128", "all"):
        conv_case(128, 128, jnp.bfloat16)
    if case in ("conv256", "all"):
        conv_case(256, 256, jnp.bfloat16, n=2)
    if case in ("einsum", "all"):
        einsum_case(jnp.bfloat16)
