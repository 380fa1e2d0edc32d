"""Experiment: variants of the flattened 3x3-conv scheme used by the PFRB
kernels, measured by IN-KERNEL repetition (R independent weight sets per
program) so the marginal cost per conv is clean of harness/DMA floors:

    rate = FLOPs(R) / (t(R) - t(0))        [t(0) = noop copy-through]

Variants:
  cur     3 dots (N=64) + f32 output slices at sublane offsets 0/1/2
  roll    3 dots + pltpu.roll
  wcat    ONE N=192 dot (dx weights concatenated), lane slices + shifts
  wcat_roll  same but pltpu.roll for the row shifts
  chunk_wcat N=192 dot in 672-row M chunks
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, steps=20):
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


def conv_cur(t3, w3r, rows, c2):
    L = rows * c2
    o = [jax.lax.dot_general(t3, w3r[dx], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) for dx in range(3)]
    lv = L - 2
    acc = o[0][0:lv] + o[1][1:1 + lv] + o[2][2:2 + lv]
    return jnp.pad(acc, ((0, 2), (0, 0)))


def conv_roll(t3, w3r, rows, c2):
    L = rows * c2
    o = [jax.lax.dot_general(t3, w3r[dx], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) for dx in range(3)]
    return o[0] + pltpu.roll(o[1], L - 1, 0) + pltpu.roll(o[2], L - 2, 0)


def conv_wcat(t3, w3r, rows, c2):
    L = rows * c2
    wc = jnp.concatenate([w3r[0], w3r[1], w3r[2]], -1)
    o = jax.lax.dot_general(t3, wc, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    lv = L - 2
    acc = o[0:lv, 0:64] + o[1:1 + lv, 64:128] + o[2:2 + lv, 128:192]
    return jnp.pad(acc, ((0, 2), (0, 0)))


def conv_wcat_roll(t3, w3r, rows, c2):
    L = rows * c2
    wc = jnp.concatenate([w3r[0], w3r[1], w3r[2]], -1)
    o = jax.lax.dot_general(t3, wc, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return (o[:, 0:64] + pltpu.roll(o[:, 64:128], L - 1, 0)
            + pltpu.roll(o[:, 128:192], L - 2, 0))


def conv_chunk_wcat(t3, w3r, rows, c2, cm=672):
    L = rows * c2
    wc = jnp.concatenate([w3r[0], w3r[1], w3r[2]], -1)
    o = jnp.concatenate([
        jax.lax.dot_general(t3[i * cm:(i + 1) * cm], wc, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        for i in range(L // cm)
    ], 0)
    lv = L - 2
    acc = o[0:lv, 0:64] + o[1:1 + lv, 64:128] + o[2:2 + lv, 128:192]
    return jnp.pad(acc, ((0, 2), (0, 0)))


CONVS = dict(cur=conv_cur, roll=conv_roll, wcat=conv_wcat,
             wcat_roll=conv_wcat_roll, chunk_wcat=conv_chunk_wcat)


def kernel(x_ref, w_ref, o_ref, *, body, rows, c2, reps):
    c = x_ref.shape[-1]
    x2 = x_ref[0].reshape((rows + 2) * c2, c)
    L = rows * c2
    t3 = jnp.concatenate([x2[0:L], x2[c2:c2 + L], x2[2 * c2:2 * c2 + L]], -1)
    acc = jnp.zeros((L, c), jnp.float32)
    for r in range(reps):
        acc = acc + body(t3, w_ref[r], rows, c2)
    o_ref[0] = acc.reshape(rows, c2, c).astype(o_ref.dtype)


def case(name, reps, rows=16, c2=336, c=64, grid=112, dtype=jnp.bfloat16,
         quiet=False):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((grid, rows + 2, c2, c)).astype(np.float32), dtype)
    w = jnp.asarray(rng.standard_normal((max(reps, 1), 3, 3 * c, c)).astype(np.float32), dtype)

    def fn(x, w):
        return pl.pallas_call(
            functools.partial(kernel, body=CONVS[name], rows=rows, c2=c2, reps=reps),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((1, rows + 2, c2, c), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec(w.shape, lambda i: (0, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, rows, c2, c), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((grid, rows, c2, c), dtype),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(x, w)

    dt = timeit(fn, x, w)
    if not quiet:
        print(f"{name:10s} reps={reps:2d}: {dt*1e3:.3f} ms total", flush=True)
    return dt


if __name__ == "__main__":
    names = sys.argv[1:] or list(CONVS)
    base_dt = {}
    for n in names:
        d1 = case(n, 1, quiet=True)
        d8 = case(n, 8, quiet=True)
        rows, c2, c, grid = 16, 336, 64, 112
        fl = 2 * rows * c2 * 9 * c * c * grid * 7  # marginal 7 reps
        rate = fl / (d8 - d1)
        print(f"{n:10s}: t1={d1*1e3:.3f} t8={d8*1e3:.3f} ms -> marginal "
              f"{rate/1e12:.1f} TFLOP/s", flush=True)
