"""Dissect the LTDVSR step cost at bench geometry (b16, 5 frames,
180x320 LR -> 720p).  Hypothesis: the temporal-weighting net runs three
5x5 convs (5->32, 32->16, 16->3) on the FULL 720p grid — the same
lane-starved pattern packed_conv fixed for DRVSR's decoder tail.

Stages (scan-chained, relay-aware):
  A  rgb2y + LTDFlow (n*t = 80 frame pairs, pooled)
  B  bounded splat r=1 (80 frames)
  C  three temporal branches (64-ch convs @LR + d2s)
  D  bilinear x4 of 5 Y frames to 720p
  E  temporal weighting net (3x 5x5 conv @720p) + softmax blend
  F  full model forward

Run from /root/repo:  python scripts/ltdvsr_bench.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from pfnl_tpu.models.ltdvsr import LTDVSR
from pfnl_tpu.models.flows import LTDFlow
from pfnl_tpu.ops.color import rgb2y
from pfnl_tpu.ops.resize import resize_bilinear
from pfnl_tpu.ops.shuffle import depth_to_space
from pfnl_tpu.ops.warp import forward_warp_local


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


def main(batch=16, t=5, h=180, w=320, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    s = 4
    oh, ow = h * s, w * s
    n = batch
    x = jnp.asarray(rng.random((n, t, h, w, 3), np.float32), dtype)

    model = LTDVSR(dtype=dtype)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x))()
    p = variables["params"]

    flow = LTDFlow(dtype=dtype)
    flat = jnp.asarray(rng.random((n * t, h, w, 1), np.float32), dtype)
    refr = jnp.asarray(rng.random((n * t, h, w, 1), np.float32), dtype)
    fvars = jax.jit(lambda: flow.init(jax.random.PRNGKey(1), flat, refr))()
    uv = jnp.asarray(
        np.tanh(rng.standard_normal((n * t, h, w, 2))).astype(np.float32),
        dtype)
    warped = jnp.asarray(rng.random((n, t, h, w, 1), np.float32), dtype)
    frames_y = jnp.asarray(rng.random((n, t, h, w, 1), np.float32), dtype)

    def conv(xx, name):
        k = p[name]["kernel"].astype(dtype)
        b = p[name]["bias"].astype(dtype)
        return lax.conv_general_dilated(
            xx, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

    def stage_a(flat, refr, cc):
        return flow.apply(fvars, flat + cc.astype(dtype) * 1e-12, refr)

    def stage_b(flat, uv, cc):
        return forward_warp_local(flat + cc.astype(dtype) * 1e-12, uv, 1)

    nnrelu = jax.nn.relu

    def _branch(b, xx):
        xx = nnrelu(conv(xx, f"conv{b}_0"))
        xx = nnrelu(conv(xx, f"conv{b}_1"))
        xx = nnrelu(conv(xx, f"conv{b}_3"))
        xx = conv(xx, f"conv{b}_2")
        return depth_to_space(xx, s)

    idx0 = t // 2

    def cat(warped, lo, hi):
        return warped[:, lo:hi].transpose(0, 2, 3, 1, 4).reshape(
            n, h, w, hi - lo)

    def stage_c(warped, cc):
        wx = warped + cc.astype(dtype) * 1e-12
        e0 = _branch(0, cat(wx, idx0, idx0 + 1))
        e1 = _branch(1, cat(wx, idx0 - 1, idx0 + 2))
        e2 = _branch(2, cat(wx, idx0 - 2, idx0 + 3))
        return e0 + e1 + e2

    def stage_d(frames_y, cc):
        return resize_bilinear(frames_y + cc.astype(dtype) * 1e-12, (oh, ow))

    bil = jax.jit(lambda fy: resize_bilinear(fy, (oh, ow)))(frames_y)

    def stage_e(bil, cc):
        tem = bil + cc.astype(dtype) * 1e-12
        tem = tem.transpose(0, 2, 3, 1, 4).reshape(n, oh, ow, t)
        tem = nnrelu(conv(tem, "tem0"))
        tem = nnrelu(conv(tem, "tem1"))
        return jax.nn.softmax(conv(tem, "tem2"), axis=-1)

    def stage_f(x, cc):
        return model.apply(variables, x + cc.astype(dtype) * 1e-12)["sr"]

    for name, fn, args in [
        ("A flow (80 pairs)", stage_a, (flat, refr)),
        ("B splat r=1", stage_b, (flat, uv)),
        ("C 3 branches @LR", stage_c, (warped,)),
        ("D bilinear x4", stage_d, (frames_y,)),
        ("E tem net @720p", stage_e, (bil,)),
        ("F full forward", stage_f, (x,)),
    ]:
        dt = timeit(fn, *args)
        print(f"{name:22s} {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
