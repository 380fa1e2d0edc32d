"""Dissect DUF_52L inference at bench geometry (b1, 7 frames, 180x320
LR -> 720p, bf16): the fused dense backbone took the family 5.5 -> 17.5
fps; where do the remaining ~57 ms/frame go?

Probes (scan-chained, relay-aware):
  A   conv1 alone (1x3x3 3->64)
  BC  FRNet forward = conv1 + fused dense backbone + head
  C   head alone (fbn1 + conv2 + r/f towers + softmax25), driven by a
      random backbone-shaped activation (content-independent timing)
  D   dyn_filter x3 + d2s + residual add
  E   full model forward
The backbone-only time is inferred: B = BC - A - C.

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
import flax.linen as nn

from pfnl_tpu.models.duf import DUF, FRNet, Conv3D, RefBatchNorm
from pfnl_tpu.ops.dynfilter import dyn_filter_3d
from pfnl_tpu.ops.shuffle import depth_to_space, depth_to_space_3d


class HeadProbe(nn.Module):
    """FRNet head (models/duf.py:228-240) as a standalone module; param
    names match the FRNet tree so the real variables bind directly."""

    @nn.compact
    def __call__(self, xb):
        r2 = 16
        x = nn.relu(RefBatchNorm(features=448, name="fbn1")(xb, False))
        x = nn.relu(Conv3D(256, (1, 3, 3), in_features=448, pad="hw",
                           name="conv2")(x))
        r = nn.relu(Conv3D(256, (1, 1, 1), in_features=256, name="rconv1")(x))
        r = Conv3D(3 * r2, (1, 1, 1), in_features=256, name="rconv2")(r)
        f = nn.relu(Conv3D(512, (1, 1, 1), in_features=256, name="fconv1")(x))
        f = Conv3D(25 * r2, (1, 1, 1), in_features=512, name="fconv2")(f)
        b, t_out, h, w, _ = f.shape
        f = f.reshape(b, t_out, h, w, 25, r2)
        f = nn.softmax(f.astype(jnp.float32), axis=4)
        return f, r


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

    # A: conv1 alone, bound to the real weights
    conv1 = Conv3D(64, (1, 3, 3), in_features=3, pad="hw", name="conv1")
    c1v = {"params": {"conv1": variables["params"]["G"]["conv1"]}}

    def stage_a(x, cc):
        return conv1.apply(
            {"params": c1v["params"]["conv1"]},
            x + cc.astype(dtype) * 1e-12).sum()

    # C: head alone on a random backbone-shaped activation [B,1,H,W,448]
    head = HeadProbe()
    hp = {k: variables["params"]["G"][k]
          for k in ("fbn1", "conv2", "rconv1", "rconv2", "fconv1", "fconv2")
          if k in variables["params"]["G"]}
    hb = {"fbn1": variables["batch_stats"]["G"]["fbn1"]}
    xb = jnp.asarray(rng.random((n, 1, h, w, 448), np.float32), dtype)

    def stage_c(xb, cc):
        f, r = head.apply({"params": hp, "batch_stats": hb},
                          xb + cc.astype(dtype) * 1e-12)
        return f.sum() + r.sum()

    def stage_d(x32, fx, rx, cc):
        chans = []
        for c in range(3):
            tt = dyn_filter_3d(x32[:, 3:4, :, :, c] + cc * 1e-12,
                               fx[:, 0], (1, 5, 5))
            chans.append(depth_to_space(tt, s))
        sr = jnp.concatenate(chans, axis=3)[:, None]
        return sr + depth_to_space_3d(rx.astype(jnp.float32), s)

    res = {}
    for name, fn, args in [
        ("A conv1", stage_a, (x,)),
        ("BC frnet fwd", stage_bc, (x,)),
        ("C head only", stage_c, (xb,)),
        ("D dynfilter+d2s", stage_d, (x32, fx, rx)),
        ("E full forward", stage_e, (x,)),
    ]:
        dt = timeit(fn, *args)
        res[name.split()[0]] = dt
        print(f"{name:20s} {dt*1e3:8.2f} ms")
    print(f"{'B backbone (BC-A-C)':20s} "
          f"{(res['BC'] - res['A'] - res['C'])*1e3:8.2f} ms")
    print(f"{'E-BC-D (glue)':20s} "
          f"{(res['E'] - res['BC'] - res['D'])*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
