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
    x = x_ref[0]
    acc = jnp.zeros((x.shape[0], w_ref.shape[-1]), jnp.float32)
    for r in range(reps):
        acc += jax.lax.dot_general(
            x, w_ref[r], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    o_ref[0] = acc.astype(o_ref.dtype)


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
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
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


def conv_kernel_dy(x_ref, w_ref, o_ref, *, rows, cols):
    """Realistic conv1-style compute: dy-triple concat then 3 K=192 dots."""
    x = x_ref[0]  # [rows+2, cols+2, C]
    t3 = jnp.concatenate([x[0:rows], x[1:rows + 1], x[2:rows + 2]], axis=-1)
    acc = None
    for dx in range(3):
        a = jax.lax.slice_in_dim(t3, dx, dx + cols, axis=1)
        d = jax.lax.dot_general(a, w_ref[dx], (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    o_ref[0] = acc.astype(o_ref.dtype)


def case_convdy(rows=6, cols=322, c=64, grid=64, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((grid, rows + 2, cols + 2, c)).astype(np.float32), dtype)
    w = jnp.asarray(rng.standard_normal((3, 3 * c, c)).astype(np.float32), dtype)

    def fn(x, w):
        return pl.pallas_call(
            functools.partial(conv_kernel_dy, rows=rows, cols=cols),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((1, rows + 2, cols + 2, c), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((3, 3 * c, c), lambda i: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, rows, cols, c), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((grid, rows, cols, c), dtype),
        )(x, w)

    dt = timeit(fn, x, w)
    fl = 2 * rows * cols * 9 * c * c * grid
    print(f"conv-dy rows={rows} cols={cols} C={c} grid={grid}: {dt*1e3:.3f} ms -> "
          f"{fl/dt/1e12:.1f} TFLOP/s", flush=True)


def conv_kernel_taps(x_ref, w_ref, o_ref, *, rows, cols):
    """Current _conv_taps style: 9 K=64 dots on sliced operands."""
    x = x_ref[0]
    acc = None
    k = 0
    for dy in range(3):
        for dx in range(3):
            a = jax.lax.slice_in_dim(
                jax.lax.slice_in_dim(x, dy, dy + rows, axis=0), dx, dx + cols, axis=1)
            d = jax.lax.dot_general(a, w_ref[k], (((2,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
            k += 1
    o_ref[0] = acc.astype(o_ref.dtype)


def case_convtaps(rows=6, cols=322, c=64, grid=64, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((grid, rows + 2, cols + 2, c)).astype(np.float32), dtype)
    w = jnp.asarray(rng.standard_normal((9, c, c)).astype(np.float32), dtype)

    def fn(x, w):
        return pl.pallas_call(
            functools.partial(conv_kernel_taps, rows=rows, cols=cols),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((1, rows + 2, cols + 2, c), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((9, c, c), lambda i: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, rows, cols, c), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((grid, rows, cols, c), dtype),
        )(x, w)

    dt = timeit(fn, x, w)
    fl = 2 * rows * cols * 9 * c * c * grid
    print(f"conv-taps rows={rows} cols={cols} C={c} grid={grid}: {dt*1e3:.3f} ms -> "
          f"{fl/dt/1e12:.1f} TFLOP/s", flush=True)


def conv_kernel_2d(x_ref, w_ref, o_ref, *, rows, c2, cols_out):
    """2D-flattened conv: x [rows+2, C2, C] as [(rows+2)*C2, C]; dy slices
    at offsets dy*C2 (tile-aligned when C2%16==0), dy-concat to K=3C,
    3 dots, dx shifts as offset adds, reshape back."""
    x = x_ref[0]  # [(rows+2), c2, cc]
    cc = x.shape[-1]
    x2 = x.reshape((rows + 2) * c2, cc)
    L = rows * c2
    t3 = jnp.concatenate(
        [x2[0:L], x2[c2 : c2 + L], x2[2 * c2 : 2 * c2 + L]], axis=-1
    )  # [L, 3C]
    outs = []
    for dx in range(3):
        outs.append(
            jax.lax.dot_general(t3, w_ref[dx], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        )  # [L, C]
    Lv = L - 2
    acc = outs[0][0:Lv] + outs[1][1 : 1 + Lv] + outs[2][2 : 2 + Lv]
    acc = jnp.pad(acc, ((0, 2), (0, 0)))
    o_ref[0] = acc.reshape(rows, c2, cc).astype(o_ref.dtype)[:, :cols_out, :]


def case_conv2d(rows=8, c2=336, cols_out=332, c=64, grid=64, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((grid, rows + 2, c2, c)).astype(np.float32), dtype)
    w = jnp.asarray(rng.standard_normal((3, 3 * c, c)).astype(np.float32), dtype)

    def fn(x, w):
        return pl.pallas_call(
            functools.partial(conv_kernel_2d, rows=rows, c2=c2, cols_out=cols_out),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((1, rows + 2, c2, c), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((3, 3 * c, c), lambda i: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, rows, cols_out, c), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((grid, rows, cols_out, c), dtype),
        )(x, w)

    dt = timeit(fn, x, w)
    fl = 2 * rows * c2 * 9 * c * c * grid
    print(f"conv-2d rows={rows} c2={c2} grid={grid}: {dt*1e3:.3f} ms -> "
          f"{fl/dt/1e12:.1f} TFLOP/s", flush=True)


def check_conv2d_correct():
    """Correctness of the 2D scheme vs lax.conv on small shapes (on-TPU)."""
    rng = np.random.default_rng(0)
    rows, c2, c = 8, 48, 64
    x = jnp.asarray(rng.standard_normal((1, rows + 2, c2, c)).astype(np.float32), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, c, c)).astype(np.float32), jnp.float32)
    wd = jnp.stack([jnp.concatenate([w[0, dx], w[1, dx], w[2, dx]], 0) for dx in range(3)])

    got = pl.pallas_call(
        functools.partial(conv_kernel_2d, rows=rows, c2=c2, cols_out=c2 - 2),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, rows + 2, c2, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((3, 3 * c, c), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows, c2 - 2, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, rows, c2 - 2, c), jnp.float32),
    )(x, wd)
    ref = jax.lax.conv_general_dilated(
        x[0, :, :, :][None], w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :rows]
    print("conv-2d correctness max diff:",
          float(jnp.max(jnp.abs(got[0] - ref))), flush=True)
