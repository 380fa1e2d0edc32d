"""Dissect the DRVSR step cost at bench geometry (b4, 3 frames, 180x320
LR -> 720p): where do the ~193 ms per window go?

Stages (scan-chained, relay-aware):
  A  rgb2y + bicubic ref
  B  EasyFlow (3 frames vs center)
  C  SPMC HR splat (Pallas phase kernel)
  D  LR flow-loss splat (forward_warp_local r=2)
  E  ConvLSTM encoder/decoder scan over T=3 (the trunk)
  F  full model forward
  E1..E9  the trunk's individual convs at their real shapes

Run from /root/repo:  python scripts/drvsr_bench.py
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

from pfnl_tpu.models.drvsr import DRVSR, _SRStep
from pfnl_tpu.models.flows import EasyFlow
from pfnl_tpu.ops.color import rgb2y
from pfnl_tpu.ops.convlstm import ConvLSTMCell
from pfnl_tpu.ops.resize import resize_bicubic
from pfnl_tpu.ops.warp import forward_warp_local, forward_warp_spmc


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


def main(batch=4, t=3, h=180, w=320, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    s = 4
    oh, ow = h * s, w * s
    n = batch
    x = jnp.asarray(rng.random((n, t, h, w, 3), np.float32), dtype)

    model = DRVSR(dtype=dtype)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x))()

    flow = EasyFlow(dtype=dtype)
    flat = jnp.asarray(rng.random((n * t, h, w, 1), np.float32), dtype)
    refr = jnp.asarray(rng.random((n * t, h, w, 1), np.float32), dtype)
    fvars = flow.init(jax.random.PRNGKey(1), flat, refr)
    uv = jnp.asarray(
        np.tanh(rng.standard_normal((n * t, h, w, 2))).astype(np.float32) * 2,
        dtype)

    step = _SRStep(dtype=dtype)
    warped_hr = jnp.asarray(rng.random((n, t, oh, ow, 1), np.float32), dtype)
    state0 = ConvLSTMCell.zero_state(n, oh // 4, ow // 4, 128, dtype)
    svars = step.init(jax.random.PRNGKey(2), state0, warped_hr[:, 0])

    def stage_a(x, cc):
        fy = rgb2y(x + cc.astype(dtype) * 1e-12)
        return resize_bicubic(fy[:, t // 2], (oh, ow))

    def stage_b(flat, refr, cc):
        return flow.apply(fvars, flat + cc.astype(dtype) * 1e-12, refr)

    def stage_c(flat, uv, cc):
        return forward_warp_spmc(flat + cc.astype(dtype) * 1e-12, uv, s)

    def stage_d(flat, uv, cc):
        return forward_warp_local(flat + cc.astype(dtype) * 1e-12, uv, 2)

    def _scan_trunk(mdl, st, xs):
        scan_fn = nn.scan(
            lambda m, s_, xi: m(s_, xi),
            variable_broadcast="params",
            split_rngs={"params": False}, in_axes=1, out_axes=1)
        return scan_fn(mdl, st, xs)

    def stage_e(warped_hr, cc):
        _, outs = nn.apply(_scan_trunk, step)(
            svars, state0, warped_hr + cc.astype(dtype) * 1e-12)
        return outs

    def stage_f(x, cc):
        return model.apply(variables, x + cc.astype(dtype) * 1e-12)["sr"]

    for name, fn, args in [
        ("A rgb2y+bicubic ", stage_a, (x,)),
        ("B easyflow x3   ", stage_b, (flat, refr)),
        ("C spmc splat    ", stage_c, (flat, uv)),
        ("D lr splat r=2  ", stage_d, (flat, uv)),
        ("E trunk scan T=3", stage_e, (warped_hr,)),
        ("F full forward  ", stage_f, (x,)),
    ]:
        dt = timeit(fn, *args)
        print(f"{name}: {dt*1e3:7.2f} ms", flush=True)

    # individual trunk convs at their real shapes (batch n, ONE frame)
    p = jax.random.PRNGKey(3)
    convs = [
        ("enc1 5x5 1->32 @720p  ", (n, oh, ow, 1), 32, 5, 1, False),
        ("enc2 3x3 32->64 /2    ", (n, oh, ow, 32), 64, 3, 2, False),
        ("enc2_1 3x3 64->64     ", (n, oh // 2, ow // 2, 64), 64, 3, 1, False),
        ("enc3 3x3 64->128 /2   ", (n, oh // 2, ow // 2, 64), 128, 3, 2, False),
        ("lstm gates 256->512   ", (n, oh // 4, ow // 4, 256), 512, 3, 1, False),
        ("enc3_1 3x3 128->128   ", (n, oh // 4, ow // 4, 128), 128, 3, 1, False),
        ("dec1 4x4T 128->64 x2  ", (n, oh // 4, ow // 4, 128), 64, 4, 2, True),
        ("dec1_1 3x3 64->64     ", (n, oh // 2, ow // 2, 64), 64, 3, 1, False),
        ("dec2 4x4T 64->32 x2   ", (n, oh // 2, ow // 2, 64), 32, 4, 2, True),
        ("dec2_1 3x3 32->32     ", (n, oh, ow, 32), 32, 3, 1, False),
        ("dec3 5x5 32->1        ", (n, oh, ow, 32), 1, 5, 1, False),
    ]
    for name, ishape, feats, k, stride, transpose in convs:
        xi = jnp.asarray(rng.random(ishape, np.float32), dtype)
        if transpose:
            mod = nn.ConvTranspose(feats, (k, k), strides=(stride, stride),
                                   padding="SAME", dtype=dtype)
        else:
            mod = nn.Conv(feats, (k, k), strides=(stride, stride),
                          padding="SAME", dtype=dtype)
        cvars = mod.init(p, xi)

        def one(xi, cc, mod=mod, cvars=cvars):
            return mod.apply(cvars, xi + cc.astype(dtype) * 1e-12)

        dt = timeit(one, xi)
        print(f"  {name}: {dt*1e3:7.2f} ms (x{t} frames)", flush=True)


if __name__ == "__main__":
    main()
