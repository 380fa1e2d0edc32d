"""Time the fused PFRB kernel vs XLA on TPU at bench shapes."""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from pfnl_tpu.ops.pallas.pfrb_fused import pfrb_chain, pfrb_chain_xla


def timeit(fn, feat, steps=10):
    floor_fn = jax.jit(lambda: jnp.float32(1.0))
    float(floor_fn())
    t0 = time.perf_counter()
    float(floor_fn())
    floor = time.perf_counter() - t0

    @jax.jit
    def chained(feat):
        def body(cr, _):
            o = fn(feat + cr.astype(feat.dtype) * 1e-12)
            return jnp.mean(o.astype(jnp.float32)), None

        s, _ = lax.scan(body, jnp.float32(0.0), None, length=steps)
        return s

    float(chained(feat))
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        float(chained(feat))
        ts.append(time.perf_counter() - t0)
    return (min(ts) - floor) / steps


if __name__ == "__main__":
    import sys

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    rng = np.random.default_rng(0)
    n, t, h, w, c = batch, 7, 180, 320, 64
    feat = jnp.asarray(
        rng.standard_normal((n, t, h, w, c)).astype(np.float32) * 0.05, jnp.bfloat16
    )
    params = [
        tuple(
            jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.05)
            for s in [(3, 3, c, c), (c,), (t, c, c), (c,), (3, 3, c, c), (3, 3, c, c), (c,)]
        )
    ]
    out = pfrb_chain(feat, params)
    ref = pfrb_chain_xla(feat, params)
    print(
        "tpu max diff vs xla:",
        float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))),
        flush=True,
    )
    dt = timeit(lambda f: pfrb_chain(f, params), feat)
    print(f"pallas PFRB: {dt*1e3:.2f} ms/block (batch {batch})", flush=True)
    dt = timeit(lambda f: pfrb_chain_xla(f, params), feat)
    print(f"xla    PFRB: {dt*1e3:.2f} ms/block (batch {batch})", flush=True)
