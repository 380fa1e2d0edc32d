"""Dissect DUF_52L inference at bench geometry (b1, 7 frames, 180x320
LR -> 720p, bf16): the fused dense backbone took the family 5.5 -> 17.5
fps; where do the remaining ~57 ms/frame go?

Stages (scan-chained, relay-aware):
  A  conv1 (1x3x3 3->64)
  B  fused dense backbone (21 thw + 3 hw blocks, Pallas)
  C  head: fbn1 + conv2 + r/f towers + softmax(25)
  D  dyn_filter x3 + d2s + residual add
  E  full model forward

Run from /root/repo:  python scripts/duf_stage_bench.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from pfnl_tpu.models.duf import DUF, FRNet
from pfnl_tpu.ops.dynfilter import dyn_filter_3d
from pfnl_tpu.ops.shuffle import depth_to_space, depth_to_space_3d


def timeit(fn, *args, steps=5):
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


def main(batch=1, t=7, h=180, w=320, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    s = 4
    n = batch
    x = jnp.asarray(rng.random((n, t, h, w, 3), np.float32), dtype)

    model = DUF(layers=52, dtype=dtype)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), x, is_train=False))()

    # stage probes reuse FRNet internals via module surgery: bind and call
    frnet = FRNet(layers=52, name="G")
    gvars = {"params": variables["params"]["G"],
             "batch_stats": variables["batch_stats"]["G"]}

    def stage_e(x, cc):
        return model.apply(variables, x + cc.astype(dtype) * 1e-12,
                           is_train=False)["sr"]

    def stage_bc(x, cc):
        f, r = frnet.apply(gvars, x + cc.astype(dtype) * 1e-12,
                           is_train=False)
        return f.sum() + r.sum()

    fx, rx = jax.jit(lambda x: frnet.apply(gvars, x, is_train=False))(x)
    x32 = x.astype(jnp.float32)

    def stage_d(x32, fx, rx, cc):
        chans = []
        for c in range(3):
            tt = dyn_filter_3d(x32[:, 3:4, :, :, c] + cc * 1e-12,
                               fx[:, 0], (1, 5, 5))
            chans.append(depth_to_space(tt, s))
        sr = jnp.concatenate(chans, axis=3)[:, None]
        return sr + depth_to_space_3d(rx.astype(jnp.float32), s)

    for name, fn, args in [
        ("B+C backbone+head", stage_bc, (x,)),
        ("D dynfilter+d2s", stage_d, (x32, fx, rx)),
        ("E full forward", stage_e, (x,)),
    ]:
        dt = timeit(fn, *args)
        print(f"{name:20s} {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
