"""Micro-bench: tap-packed Pallas 3x3x3 conv vs the native XLA lowering
for DUF dense-block shapes (bf16, 180x320)."""

import sys, time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from pfnl_tpu.ops.pallas.duf_dense import conv3x3x3_tap, _conv3x3x3_xla


def timeit(fn, *args, iters=20):
    @jax.jit
    def chained(*a):
        def body(c, _):
            out = fn(a[0] + c * 1e-12, *a[1:])
            return jnp.mean(out.astype(jnp.float32)).astype(a[0].dtype), None

        s, _ = lax.scan(body, jnp.zeros((), a[0].dtype), None, length=iters)
        return s

    float(chained(*args))  # compile
    t0 = time.perf_counter()
    float(chained(*args))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    t, h, w = 7, 180, 320
    print(f"{'F':>5} {'xla ms':>8} {'pallas ms':>10} {'GFLOP':>7} "
          f"{'xla TF/s':>9} {'pal TF/s':>9}")
    for f in (64, 128, 192, 256, 320, 384, 448):
        x = jnp.asarray(rng.standard_normal((1, t, h, w, f)), jnp.bfloat16) * 0.1
        wk = jnp.asarray(rng.standard_normal((3, 3, 3, f, 16)), jnp.float32) * 0.05
        dt_x = timeit(lambda a: _conv3x3x3_xla(a, wk, True), x)
        dt_p = timeit(lambda a: conv3x3x3_tap(a, wk, True), x)
        gf = 2 * t * h * w * 27 * f * 16 / 1e9
        print(f"{f:>5} {dt_x*1e3:>8.2f} {dt_p*1e3:>10.2f} {gf:>7.1f} "
              f"{gf/dt_x/1e3:>9.1f} {gf/dt_p/1e3:>9.1f}")


if __name__ == "__main__":
    main()
