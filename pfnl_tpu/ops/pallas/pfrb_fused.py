"""Fused Progressive-Fusion Residual Block (PFRB) TPU kernel.

One PFRB (reference model/pfnl.py:65-71, as refactored in
pfnl_tpu.models.pfnl) is, per sample:

    i1_t  = lrelu(conv3x3(feat_t, W1) + b1)            t = 0..T-1 (shared W1)
    base  = lrelu(sum_t i1_t @ Wfuse_t + bfuse)        1x1 fusion over frames
    i2_t  = lrelu(conv3x3(i1_t, W2f) + conv3x3(base, W2b) + b2)
    out_t = feat_t + i2_t

Executed in XLA this costs ~8.4 ms/block at batch 4 (three HBM round trips
of a 206 MB activation + 64-channel convs at ~26 TFLOP/s).  This kernel
keeps the whole block in VMEM per (batch, row-tile) program:

  * halo rows come from fetching the previous/current/next row-blocks of
    the SAME input (three BlockSpecs with clamped index maps) — XLA's
    pipeline double-buffers them; no manual DMA;
  * 3x3 convs are 9 MXU dots per conv (one per tap, K=C);
  * the fusion matmul accumulates across the unrolled frame loop;
  * the base half of conv2 is computed once per tile, not per frame.

Wrapper handles H padding to the row-tile multiple and W-halo zero
padding (SAME-conv semantics preserved).  Backward pass: custom_vjp whose
bwd re-traces the XLA reference implementation — training crops are tiny,
so the XLA gradient path costs little while inference gets the kernel.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TAPS = [(0, 0), (0, 1), (0, 2), (1, 0), (1, 1), (1, 2), (2, 0), (2, 1), (2, 2)]


def _pack_taps(w: jax.Array) -> jax.Array:
    """[3,3,C,F] conv kernel -> [9,C,F] per-tap weights."""
    return w.reshape(9, w.shape[2], w.shape[3])


def _conv_taps(x, w9):
    """x: [R+2h, W+2h, C] padded input (halo 1 each side of the output
    region), w9: [9, C, F] per-tap weights.  Returns [R, W, F] f32.

    One MXU dot per tap (K=C) — Mosaic cannot yet concatenate lane-offset
    slices, which rules out tap-pairing to K=2C."""
    rows = x.shape[-3] - 2
    cols = x.shape[-2] - 2
    acc = None
    for k, (dy, dx) in enumerate(_TAPS):
        a = jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(x, dy, dy + rows, axis=-3),
            dx, dx + cols, axis=-2,
        )
        d = jax.lax.dot_general(
            a, w9[k],
            (((a.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = d if acc is None else acc + d
    return acc


def _lrelu(x, alpha=0.2):
    return jnp.maximum(x, alpha * x)


def _kernel(x_prev, x_cur, x_next, wp1, b1, wfuse, bfuse, wp2f, wp2b, b2,
            out_ref, *, rows, n_tiles, h_true):
    i = pl.program_id(1)
    t_frames = x_cur.shape[1]
    w = x_cur.shape[3]

    # assemble [T, rows+4, W, C] with halo rows from neighbour blocks
    top = x_prev[0, :, rows - 2 :, :, :]
    bot = x_next[0, :, :2, :, :]
    x = jnp.concatenate([top, x_cur[0], bot], axis=1)
    # zero rows outside the true image (SAME conv semantics; h may be
    # padded to a multiple of `rows` by the wrapper)
    row_id = jax.lax.broadcasted_iota(jnp.int32, (1, rows + 4, 1, 1), 1)
    g_row = i * rows + row_id - 2
    x = jnp.where((g_row >= 0) & (g_row < h_true), x, 0)
    # zero-pad W halo (2 cols each side: conv1 halo + conv2 halo)
    x = jnp.pad(x, ((0, 0), (0, 0), (2, 2), (0, 0)))

    dtype = x_cur.dtype
    # SAME-conv semantics for conv2: i1/base are ZERO outside the image —
    # mask the halo ring where it crosses the image boundary (the reference
    # zero-pads i1/base for conv2, it does not extrapolate them)
    r_id = jax.lax.broadcasted_iota(jnp.int32, (rows + 2, w + 2, 1), 0)
    c_id = jax.lax.broadcasted_iota(jnp.int32, (rows + 2, w + 2, 1), 1)
    g_r = i * rows + r_id - 1
    ring_valid = (c_id >= 1) & (c_id <= w) & (g_r >= 0) & (g_r < h_true)

    # conv1 over the i1 region (rows+2, w+2), then fuse across frames
    i1 = []
    base_acc = None
    for t in range(t_frames):
        acc = _conv_taps(x[t], wp1[:]) + b1[:].astype(jnp.float32)
        i1_t = jnp.where(ring_valid, _lrelu(acc), 0.0)
        i1.append(i1_t.astype(dtype))
        contrib = jax.lax.dot_general(
            i1_t.astype(dtype), wfuse[t],
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        base_acc = contrib if base_acc is None else base_acc + contrib
    base = jnp.where(
        ring_valid, _lrelu(base_acc + bfuse[:].astype(jnp.float32)), 0.0
    ).astype(dtype)

    # conv2: base half once, frame half per frame; residual add
    base_part = _conv_taps(base, wp2b[:])  # [rows, w, C] f32
    for t in range(t_frames):
        frame_part = _conv_taps(i1[t], wp2f[:])
        i2 = _lrelu(frame_part + base_part + b2[:].astype(jnp.float32))
        center = x[t, 2 : rows + 2, 2 : w + 2, :].astype(jnp.float32)
        out_ref[0, t] = (center + i2).astype(out_ref.dtype)


def _pfrb_pallas(feat, w1, b1, wfuse, bfuse, w2f, w2b, b2, rows=4):
    n, t, h, w, c = feat.shape
    pad_h = (-h) % rows
    if pad_h:
        feat = jnp.pad(feat, ((0, 0), (0, 0), (0, pad_h), (0, 0), (0, 0)))
    hp = h + pad_h
    n_tiles = hp // rows

    wp1 = _pack_taps(w1.astype(feat.dtype))
    wp2f = _pack_taps(w2f.astype(feat.dtype))
    wp2b = _pack_taps(w2b.astype(feat.dtype))
    wfuse_c = wfuse.astype(feat.dtype)

    block = (1, t, rows, w, c)
    grid = (n, n_tiles)
    last = n_tiles - 1

    out = pl.pallas_call(
        functools.partial(_kernel, rows=rows, n_tiles=n_tiles, h_true=h),
        grid=grid,
        in_specs=[
            pl.BlockSpec(block, lambda b, i: (b, 0, jnp.maximum(i - 1, 0), 0, 0)),
            pl.BlockSpec(block, lambda b, i: (b, 0, i, 0, 0)),
            pl.BlockSpec(block, lambda b, i: (b, 0, jnp.minimum(i + 1, last), 0, 0)),
            pl.BlockSpec(wp1.shape, lambda b, i: (0, 0, 0)),
            pl.BlockSpec(b1.shape, lambda b, i: (0,)),
            pl.BlockSpec(wfuse_c.shape, lambda b, i: (0, 0, 0)),
            pl.BlockSpec(bfuse.shape, lambda b, i: (0,)),
            pl.BlockSpec(wp2f.shape, lambda b, i: (0, 0, 0)),
            pl.BlockSpec(wp2b.shape, lambda b, i: (0, 0, 0)),
            pl.BlockSpec(b2.shape, lambda b, i: (0,)),
        ],
        out_specs=pl.BlockSpec(block, lambda b, i: (b, 0, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, t, hp, w, c), feat.dtype),
        interpret=jax.default_backend() == "cpu",
    )(feat, feat, feat, wp1, b1, wfuse_c, bfuse, wp2f, wp2b, b2)
    return out[:, :, :h]


def pfrb_block_xla(feat, w1, b1, wfuse, bfuse, w2f, w2b, b2):
    """Reference XLA implementation (identical math; used for tests and as
    the backward path of the custom_vjp)."""
    n, t, h, w, c = feat.shape
    x = feat.reshape(n * t, h, w, c)
    conv = lambda x, k: jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    i1 = _lrelu(conv(x, w1) + b1.astype(x.dtype))
    i1_5d = i1.reshape(n, t, h, w, c)
    base = _lrelu(
        jnp.einsum("nthwc,tcd->nhwd", i1_5d, wfuse.astype(x.dtype))
        + bfuse.astype(x.dtype)
    )
    base_part = conv(base, w2b)
    frame_part = conv(i1, w2f).reshape(n, t, h, w, c)
    i2 = _lrelu(frame_part + base_part[:, None] + b2.astype(x.dtype))
    return feat + i2


@jax.custom_vjp
def pfrb_block(feat, w1, b1, wfuse, bfuse, w2f, w2b, b2):
    """Fused PFRB: Pallas forward on TPU, XLA gradient."""
    return _pfrb_pallas(feat, w1, b1, wfuse, bfuse, w2f, w2b, b2)


def _fwd(feat, w1, b1, wfuse, bfuse, w2f, w2b, b2):
    out = pfrb_block(feat, w1, b1, wfuse, bfuse, w2f, w2b, b2)
    return out, (feat, w1, b1, wfuse, bfuse, w2f, w2b, b2)


def _bwd(res, g):
    _, vjp = jax.vjp(pfrb_block_xla, *res)
    return vjp(g)


pfrb_block.defvjp(_fwd, _bwd)
