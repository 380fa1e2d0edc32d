"""Dissect the MCResNet step cost at bench geometry (b16, 5 frames,
180x320 LR -> 720p): its trunk is tiny (~320 GFLOP/step) yet the family
measures 61.7 fps (260 ms/step) — where does the time go?

Stages (scan-chained, relay-aware):
  A  rgb2y + bicubic ref (b16 @720p)
  B  EasyFlow (n*t = 80 frame pairs)
  C  bounded splat r=2 (80 frames, Pallas)
  D  distance-shared encoders (5x 5x5 1->64)
  E  9-conv trunk (320->32, 8x 32->32)
  F  head: conv6 + legacy PS x2 + rnn_out + PS
  G  full model forward

Run from /root/repo:  python scripts/mcresnet_bench.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from pfnl_tpu.models.mcresnet import MCResNet
from pfnl_tpu.models.flows import EasyFlow
from pfnl_tpu.ops.color import rgb2y
from pfnl_tpu.ops.resize import resize_bicubic
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

    model = MCResNet(dtype=dtype)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x))()

    flow = EasyFlow(dtype=dtype)
    flat = jnp.asarray(rng.random((n * t, h, w, 1), np.float32), dtype)
    refr = jnp.asarray(rng.random((n * t, h, w, 1), np.float32), dtype)
    fvars = flow.init(jax.random.PRNGKey(1), flat, refr)
    uv = jnp.asarray(
        np.tanh(rng.standard_normal((n * t, h, w, 2))).astype(np.float32) * 2,
        dtype)
    warped = jnp.asarray(rng.random((n, t, h, w, 1), np.float32), dtype)

    p = variables["params"]

    def stage_a(x, cc):
        fy = rgb2y(x + cc.astype(dtype) * 1e-12)
        return resize_bicubic(fy[:, t // 2], (oh, ow))

    def stage_b(flat, refr, cc):
        return flow.apply(fvars, flat + cc.astype(dtype) * 1e-12, refr)

    def stage_c(flat, uv, cc):
        return forward_warp_local(flat + cc.astype(dtype) * 1e-12, uv, 2)

    def _enc(warped, cc):
        wx = warped + cc.astype(dtype) * 1e-12
        outs = []
        for i in range(t):
            d = abs(i - t // 2)
            k = p[f"enc1_{d}"]["kernel"].astype(dtype)
            b = p[f"enc1_{d}"]["bias"].astype(dtype)
            o = lax.conv_general_dilated(
                wx[:, i], k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
            a = p[f"enc1_prelu_{i}"]["alpha"].astype(dtype)
            outs.append(jnp.where(o >= 0, o, a * o))
        return jnp.concatenate(outs, -1)

    merge0 = jax.jit(_enc)(warped, jnp.float32(0))

    def stage_e(merge0, cc):
        merge = merge0 + cc.astype(dtype) * 1e-12
        conv2 = merge
        for i in range(9):
            k = p[f"enc2_{i}"]["kernel"].astype(dtype)
            b = p[f"enc2_{i}"]["bias"].astype(dtype)
            o = lax.conv_general_dilated(
                merge, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
            a = p[f"enc2_prelu_{i}"]["alpha"].astype(dtype)
            conv2 = jnp.where(o >= 0, o, a * o)
            merge = conv2 if i == 0 else merge + conv2
        return conv2

    def stage_g(x, cc):
        return model.apply(variables, x + cc.astype(dtype) * 1e-12)["sr"]

    for name, fn, args in [
        ("A rgb2y+bicubic      ", stage_a, (x,)),
        ("B easyflow x80       ", stage_b, (flat, refr)),
        ("C splat r=2 x80      ", stage_c, (flat, uv)),
        ("D encoders x5        ", _enc, (warped,)),
        ("E trunk 9 convs      ", stage_e, (merge0,)),
        ("G full forward       ", stage_g, (x,)),
    ]:
        dt = timeit(fn, *args)
        print(f"{name}: {dt*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
