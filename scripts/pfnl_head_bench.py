"""Dissect the PFNL head (pre-PFRB) cost at bench geometry (VERDICT r2
weak item / ROADMAP item 4): non-local ~14 ms + conv0/pad ~8 ms of the
~245 ms step at batch 16.

Stages measured independently (scan-chained, relay-aware):
  A  frame concat + space_to_depth          x [16,7,180,320,3] -> [.,90,160,84]
  B  non-local block (auto impl)            [.,90,160,84] -> same
  C  d2s + residual + per-frame refold      -> frames [112,180,320,3]
  D  conv0 (5x5, 3->64) + lrelu             -> feat [112,180,320,64]
  E  pad_to_pack_layout                     -> packed [16,7,Hp,C2P,128]
  F  bicubic of the center frame
  G  full head (A..E fused in one jit) — what the model actually pays
  H  head variant: conv0 as one block-diagonal conv on the 21-channel
     frame-concat tensor (448-lane output) + direct packed reshape

Run from /root/repo:  python scripts/pfnl_head_bench.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from pfnl_tpu.models.blocks import NonLocalBlock, leaky_relu
from pfnl_tpu.ops.pallas.pfrb_pack import pad_to_pack_layout, pick_rows
from pfnl_tpu.ops.resize import resize_bicubic
from pfnl_tpu.ops.shuffle import depth_to_space, space_to_depth


def timeit(fn, *args, steps=20):
    floor_fn = jax.jit(lambda: jnp.float32(1.0))
    float(floor_fn())
    t0 = time.perf_counter()
    float(floor_fn())
    floor = time.perf_counter() - t0

    @jax.jit
    def chained(*a):
        def body(c, _):
            outs = fn(*a, c)
            return jnp.mean(outs.astype(jnp.float32)), None

        s, _ = lax.scan(body, jnp.float32(0.0), None, length=steps)
        return s

    float(chained(*args))
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        float(chained(*args))
        ts.append(time.perf_counter() - t0)
    return (min(ts) - floor) / steps


def main(batch=16, t=7, h=180, w=320, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, t, h, w, 3), np.float32), dtype)
    nl = NonLocalBlock(out_channels=3 * t * 4, sub_sample=1, nltype=1,
                       impl="auto", dtype=dtype)
    inp1_shape = (batch, h // 2, w // 2, 3 * t * 4)
    variables = nl.init(jax.random.PRNGKey(0),
                        jnp.zeros(inp1_shape, dtype))
    w0 = jnp.asarray(rng.random((5, 5, 3, 64), np.float32), dtype)
    b0 = jnp.zeros((64,), dtype)

    n = batch
    c = 3

    def stage_a(x, cc):
        inp0 = (x + cc.astype(dtype) * 1e-12).transpose(0, 2, 3, 1, 4)
        inp0 = inp0.reshape(n, h, w, t * c)
        return space_to_depth(inp0, 2)

    def stage_b(inp1, cc):
        return nl.apply(variables, inp1 + cc.astype(dtype) * 1e-12)

    def stage_c(inp0, inp1, cc):
        y = inp0 + depth_to_space(inp1 + cc.astype(dtype) * 1e-12, 2)
        return y.reshape(n, h, w, t, c).transpose(0, 3, 1, 2, 4).reshape(n * t, h, w, c)

    def conv0(frames, cc):
        o = lax.conv_general_dilated(
            frames + cc.astype(dtype) * 1e-12, w0, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return leaky_relu(o + b0)

    def stage_e(feat, cc):
        return pad_to_pack_layout(
            (feat + cc.astype(dtype) * 1e-12).reshape(n, t, h, w, 64),
            rows=pick_rows(h))

    def stage_f(x, cc):
        return resize_bicubic(x[:, t // 2] + cc.astype(dtype) * 1e-12,
                              (h * 4, w * 4))

    def full_head(x, cc):
        inp1 = stage_a(x, cc)
        inp0 = x.transpose(0, 2, 3, 1, 4).reshape(n, h, w, t * c)
        y = inp0 + depth_to_space(nl.apply(variables, inp1), 2)
        frames = y.reshape(n, h, w, t, c).transpose(0, 3, 1, 2, 4).reshape(n * t, h, w, c)
        feat = conv0(frames, jnp.float32(0.0))
        return stage_e(feat, jnp.float32(0.0))

    # variant H: conv0 as block-diagonal conv on the frame-concat tensor
    wblk = jnp.zeros((5, 5, t * c, t * 64), dtype)
    for f in range(t):
        wblk = wblk.at[:, :, f * c:(f + 1) * c, f * 64:(f + 1) * 64].set(w0)

    def full_head_blk(x, cc):
        inp1 = stage_a(x, cc)
        inp0 = x.transpose(0, 2, 3, 1, 4).reshape(n, h, w, t * c)
        y = inp0 + depth_to_space(nl.apply(variables, inp1), 2)
        o = lax.conv_general_dilated(
            y, wblk, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        o = leaky_relu(o + jnp.tile(b0, (t,)))          # [n,h,w,448]
        feat = o.reshape(n, h, w, t, 64).transpose(0, 3, 1, 2, 4)
        return pad_to_pack_layout(feat, rows=pick_rows(h))

    inp1 = jax.jit(stage_a)(x, jnp.float32(0))
    inp1o = jax.jit(stage_b)(inp1, jnp.float32(0))
    inp0 = x.transpose(0, 2, 3, 1, 4).reshape(n, h, w, t * c)
    frames = jax.jit(stage_c)(inp0, inp1o, jnp.float32(0))
    feat = jax.jit(conv0)(frames, jnp.float32(0))

    for name, fn, args in [
        ("A concat+s2d     ", stage_a, (x,)),
        ("B nonlocal       ", stage_b, (inp1,)),
        ("C d2s+res+refold ", stage_c, (inp0, inp1o)),
        ("D conv0          ", conv0, (frames,)),
        ("E pad_to_pack    ", stage_e, (feat,)),
        ("F bicubic        ", stage_f, (x,)),
        ("G full head      ", full_head, (x,)),
        ("H head blk-conv0 ", full_head_blk, (x,)),
    ]:
        dt = timeit(fn, *args)
        print(f"{name}: {dt*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
