"""Tune the flash non-local kernel's block sizes at PFNL bench shapes
(N = M = 14400, D = 84->128, batch 16)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from pfnl_tpu.ops.pallas.nonlocal_flash import nonlocal_flash


def timeit(fn, *args, steps=10):
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


if __name__ == "__main__":
    b, n, d = 16, 90 * 160, 84
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, n, d)).astype(np.float32) * 0.1,
                    jnp.bfloat16)
    flops = 2 * b * n * n * 128 * 2
    for bq in (256, 512, 1024, 2048):
        for bk in (512, 1024, 2048, 4096):
            try:
                dt = timeit(lambda x: nonlocal_flash(x, x, x, bq=bq, bk=bk), q)
                print(f"bq={bq:4d} bk={bk:4d}: {dt*1e3:6.2f} ms "
                      f"({flops/dt/1e12:.0f} TFLOP/s)", flush=True)
            except Exception as e:
                print(f"bq={bq:4d} bk={bk:4d}: FAIL {str(e)[:80]}", flush=True)
