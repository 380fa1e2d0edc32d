"""A/B the lane-starved 720p decoder convs (DRVSR dissection: dec3 5x5
32->1 costs 26.8 ms at b4) against space-to-depth-packed equivalents that
keep the channel (lane) dimension >= 64.

Each packed variant below is an EXACT algebraic rewrite of the original
(same function space; kernels rearranged), executed at half resolution
with 4x the channels:

  dec2_1 3x3 32->32 @720p   == conv 3x3 128->128 @360p on s2d(2) input
  dec3   5x5 32->1  @720p   == conv 3x3 128->4   @360p (+ d2s at the end)
  enc2   3x3 32->64 /2      == conv 2x2 128->64  @360p (top-left aligned)
  dec2   4x4T 64->32 x2     == conv 2x2 64->128  @360p (+ d2s)

Run from /root/repo:  python scripts/packed_conv_bench.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn


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


def conv(x, k, stride=1, pad="SAME"):
    return lax.conv_general_dilated(
        x, k, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main(b=4, oh=720, ow=1280, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    arr = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32),
                                 dtype)
    x32 = arr(b, oh, ow, 32)
    x128 = arr(b, oh // 2, ow // 2, 128)   # s2d(2)-packed stand-in
    x64h = arr(b, oh // 2, ow // 2, 64)

    cases = [
        # (name, fn, args)
        ("dec2_1 3x3 32->32 @720p      ",
         lambda x, c: conv(x + c.astype(dtype) * 1e-12, arr(3, 3, 32, 32)),
         (x32,)),
        ("packed  3x3 128->128 @360p   ",
         lambda x, c: conv(x + c.astype(dtype) * 1e-12, arr(3, 3, 128, 128)),
         (x128,)),
        ("dec3 5x5 32->1 @720p         ",
         lambda x, c: conv(x + c.astype(dtype) * 1e-12, arr(5, 5, 32, 1)),
         (x32,)),
        ("packed  3x3 128->4 @360p     ",
         lambda x, c: conv(x + c.astype(dtype) * 1e-12, arr(3, 3, 128, 4)),
         (x128,)),
        ("packed  3x3 128->8 @360p     ",
         lambda x, c: conv(x + c.astype(dtype) * 1e-12, arr(3, 3, 128, 8)),
         (x128,)),
        ("enc2 3x3 32->64 /2 @720p     ",
         lambda x, c: conv(x + c.astype(dtype) * 1e-12, arr(3, 3, 32, 64), 2),
         (x32,)),
        ("packed  2x2 128->64 @360p    ",
         lambda x, c: conv(x + c.astype(dtype) * 1e-12, arr(2, 2, 128, 64)),
         (x128,)),
        ("dec2 4x4T 64->32 x2 @360p    ",
         lambda x, c: nn.ConvTranspose(32, (4, 4), strides=(2, 2),
                                       padding="SAME", dtype=dtype).apply(
             {"params": {"kernel": arr(4, 4, 64, 32).astype(jnp.float32),
                         "bias": jnp.zeros((32,), jnp.float32)}},
             x + c.astype(dtype) * 1e-12),
         (x64h,)),
        ("packed  2x2 64->128 @360p    ",
         lambda x, c: conv(x + c.astype(dtype) * 1e-12, arr(2, 2, 64, 128)),
         (x64h,)),
        ("enc1 5x5 1->32 @720p         ",
         lambda x, c: conv(x + c.astype(dtype) * 1e-12, arr(5, 5, 1, 32)),
         (arr(b, oh, ow, 1),)),
        ("packed  3x3 4->128 @360p     ",
         lambda x, c: conv(x + c.astype(dtype) * 1e-12, arr(3, 3, 4, 128)),
         (arr(b, oh // 2, ow // 2, 4),)),
        ("s2d relayout 720p x1->x4     ",
         lambda x, c: (x + c.astype(dtype) * 1e-12).reshape(
             b, oh // 2, 2, ow // 2, 2).transpose(0, 1, 3, 2, 4).reshape(
             b, oh // 2, ow // 2, 4),
         (arr(b, oh, ow, 1),)),
        ("d2s relayout 360p x4->x1     ",
         lambda x, c: (x + c.astype(dtype) * 1e-12).reshape(
             b, oh // 2, ow // 2, 2, 2).transpose(0, 1, 3, 2, 4).reshape(
             b, oh, ow, 1),
         (arr(b, oh // 2, ow // 2, 4),)),
    ]
    for name, fn, args in cases:
        dt = timeit(fn, *args)
        print(f"{name}: {dt*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
