"""Dissect kernel A's time: strip components one at a time and measure.

full      production kernel A body
noconv    skip the 3x3 conv dot (i1 = bias broadcast)
noasm     skip assemble (conv on cur block only, no halo concat/where)
nofuse    skip the fusion dot + base output logic
nomask    skip the ring_valid where
noi1w     skip writing i1 (write only at j==0)
dmaonly   copy cur through to i1, no compute at all
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

from pfnl_tpu.ops.pallas.pfrb_split import _masks, _assemble, _specs, pad_to_split_layout
from pfnl_tpu.ops.pallas.pfrb_fused import _conv2d_flat_wcat, _lrelu, _pack_dydx


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


def kernel_a_var(prev_ref, cur_ref, next_ref, wd1, b1, wfuse, bfuse,
                 i1_ref, base_ref, *, rows, c2, h, w, n_tsteps, tb, mode):
    i = pl.program_id(1)
    ts = pl.program_id(2)
    c = cur_ref.shape[-1]
    ring_valid, _, row_valid = _masks(i, rows, c2, h, w)
    L = rows * c2

    i1s = []
    for j in range(tb):
        if mode == "dmaonly":
            i1_ref[0, j] = cur_ref[0, j]
            continue
        if mode == "noasm":
            x2 = jnp.pad(cur_ref[0, j].reshape(L, c), ((0, 2 * c2), (0, 0)))
        else:
            x = _assemble(prev_ref[0, j], cur_ref[0, j], next_ref[0, j], row_valid)
            x2 = x.reshape((rows + 2) * c2, c)
        if mode == "noconv":
            i1 = x2[0:L].astype(jnp.float32) + b1[:].astype(jnp.float32)
        else:
            i1 = _conv2d_flat_wcat(x2, wd1[:], rows, c2) + b1[:].astype(jnp.float32)
        if mode == "nomask":
            i1 = _lrelu(i1).astype(i1_ref.dtype)
        else:
            i1 = jnp.where(ring_valid, _lrelu(i1), 0.0).astype(i1_ref.dtype)
        if mode == "noi1w":
            if j == 0:
                i1_ref[0, j] = i1.reshape(rows, c2, c)
        else:
            i1_ref[0, j] = i1.reshape(rows, c2, c)
        i1s.append(i1)

    if mode in ("nofuse", "dmaonly"):
        @pl.when(ts == 0)
        def _z():
            base_ref[0] = jnp.zeros_like(base_ref[0])
        return

    cat = jnp.concatenate(i1s, axis=-1)
    contrib = jax.lax.dot_general(
        cat, wfuse[ts], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ts == 0)
    def _init():
        base_ref[0] = contrib.reshape(rows, c2, c).astype(base_ref.dtype)

    @pl.when(ts > 0)
    def _acc():
        base_ref[0] = (
            base_ref[0].astype(jnp.float32) + contrib.reshape(rows, c2, c)
        ).astype(base_ref.dtype)

    @pl.when(ts == n_tsteps - 1)
    def _fin():
        acc = base_ref[0].astype(jnp.float32).reshape(L, c)
        acc = acc + bfuse[:].astype(jnp.float32)
        acc = jnp.where(ring_valid, _lrelu(acc), 0.0)
        base_ref[0] = acc.reshape(rows, c2, c).astype(base_ref.dtype)


def run(mode, padded, params, h, w, rows_a=16, tb=4):
    w1, b1, wfuse, bfuse, *_ = params
    n, t, hp, c2, c = padded.shape
    n_tsteps = t // tb
    dtype = padded.dtype
    wd1 = _pack_dydx(w1.astype(dtype))
    wspec = lambda arr: pl.BlockSpec(arr.shape, lambda b, i, tt: (0,) * arr.ndim)
    b1r = b1.reshape(1, -1).astype(jnp.float32)
    bfr = bfuse.reshape(1, -1).astype(jnp.float32)
    wfuse_c = wfuse.astype(dtype).reshape(n_tsteps, tb * c, c)
    cur5, prev5, next5, cur4, _, _ = _specs(rows_a, tb, c2, c, hp)
    return pl.pallas_call(
        functools.partial(kernel_a_var, rows=rows_a, c2=c2, h=h, w=w,
                          n_tsteps=n_tsteps, tb=tb, mode=mode),
        grid=(n, hp // rows_a, n_tsteps),
        in_specs=[prev5, cur5, next5, wspec(wd1), wspec(b1r), wspec(wfuse_c), wspec(bfr)],
        out_specs=(cur5, cur4),
        out_shape=(
            jax.ShapeDtypeStruct((n, t, hp, c2, c), dtype),
            jax.ShapeDtypeStruct((n, hp, c2, c), dtype),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(padded, padded, padded, wd1, b1r, wfuse_c, bfr)


if __name__ == "__main__":
    import pfrb_split_bench as B
    padded, params = B.make_data(16, 180, 320, 8)
    h, w = 180, 320
    modes = sys.argv[1:] or ["full", "noconv", "noasm", "nofuse", "nomask",
                             "noi1w", "dmaonly"]
    for m in modes:
        try:
            dt = timeit(lambda p: run(m, p, params, h, w), padded)
            print(f"{m:8s}: {dt*1e3:.2f} ms", flush=True)
        except Exception as e:
            print(f"{m:8s}: FAIL {str(e)[:100]}", flush=True)
