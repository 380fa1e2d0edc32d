"""Fused PFRB as two auto-pipelined Pallas kernels (the fast path).

Design (supersedes the manual-DMA single kernel in pfrb_fused.py, whose
lane-padded DMAs doubled HBM traffic and serialized against compute):

  Kernel A  grid (B, tiles, T) [T innermost]:
      i1[b,t,tile] = ringmask(lrelu(conv3x3(feat, W1) + b1))
      base[b,tile] accumulates sum_t i1_t @ Wfuse_t across the T grid steps
      in a REVISITED output block (same block index for consecutive t), and
      is finalized (bias + lrelu + ring mask) at t == T-1.
  Kernel B  grid (B, tiles, T):
      out = feat + lrelu(conv3x3(i1_t, W2f) + conv3x3(base, W2b) + b2)
      conv3x3(base, ...) is computed once per (b, tile) at t == 0 into a
      scratch that persists across the T grid steps.

All operands move through BlockSpec pipelines (double-buffered, overlapped
with compute); halo rows come from 2-row-unit fetches of the neighbouring
blocks with clamped index maps, re-zeroed by global-row masks at the image
boundary.  Convs use the flattened-2D scheme measured at ~88 TFLOP/s
(scripts/pallas_dot_bench.py): dy-concat to K=3C, one dot per dx, flat
dx-shifted adds.

Carried activation layout: [B, T, Hp, C2, C] with the image at rows
[0, H), cols [2, W+2), zeros elsewhere; Hp % rows == 0, C2 % 16 == 0.
The model keeps this layout across all 20 blocks (pad once, unpad once).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pfnl_tpu.ops.pallas.pfrb_fused import (
    _conv2d_flat_wcat,
    _lrelu,
    _pack_dydx,
    _prec,
    _round_up,
    pfrb_chain_xla,
)


def _masks(i, rows, c2, h, w):
    """(ring_valid [rows*C2,1] for the i1/base grid, out_valid for the
    output grid, row_valid [rows+2,1,1] for assembled conv inputs)."""
    l = rows * c2
    flat = jax.lax.broadcasted_iota(jnp.int32, (l, 1), 0)
    r = flat // c2
    col = flat - r * c2
    g = i * rows + r
    # i1 grid col c <-> image col c-1
    ring_valid = (col >= 1) & (col <= w) & (g < h)
    # out grid col c == image col c
    out_valid = (col < w) & (g < h)
    rr = jax.lax.broadcasted_iota(jnp.int32, (rows + 2, 1, 1), 0)
    grow = i * rows - 1 + rr
    row_valid = (grow >= 0) & (grow < h)
    return ring_valid, out_valid, row_valid


def _assemble(prev, cur, nxt, row_valid):
    """prev/nxt: [.., 2, C2, C] 2-row units; cur: [.., rows, C2, C].
    Returns [rows+2, C2, C] with boundary rows zeroed."""
    x = jnp.concatenate([prev[-1:], cur, nxt[:1]], axis=0)
    return jnp.where(row_valid, x, 0)


def _kernel_a(prev_ref, cur_ref, next_ref, wd1, b1, wfuse, bfuse,
              i1_ref, base_ref, *, rows, c2, h, w, n_tsteps, tb):
    i = pl.program_id(1)
    ts = pl.program_id(2)  # frame-pair index; frames [ts*tb, ts*tb+tb)
    c = cur_ref.shape[-1]
    ring_valid, _, row_valid = _masks(i, rows, c2, h, w)

    i1s = []
    for j in range(tb):
        x = _assemble(prev_ref[0, j], cur_ref[0, j], next_ref[0, j], row_valid)
        x2 = x.reshape((rows + 2) * c2, c)
        i1 = _conv2d_flat_wcat(x2, wd1[:], rows, c2) + b1[:].astype(jnp.float32)
        i1 = jnp.where(ring_valid, _lrelu(i1), 0.0).astype(i1_ref.dtype)
        i1_ref[0, j] = i1.reshape(rows, c2, c)
        i1s.append(i1)
    # fusion contributions of this frame group as ONE K = tb*C dot (the
    # per-frame K=64 dots underutilize the MXU); wfuse is laid out
    # [n_tsteps, tb*C, C] so the frame group's weights are one ref row
    cat = jnp.concatenate(i1s, axis=-1)
    contrib = jax.lax.dot_general(
        cat, wfuse[ts], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_prec(cat.dtype),
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
    def _finalize():
        acc = base_ref[0].astype(jnp.float32).reshape(rows * c2, c)
        acc = acc + bfuse[:].astype(jnp.float32)
        acc = jnp.where(ring_valid, _lrelu(acc), 0.0)
        base_ref[0] = acc.reshape(rows, c2, c).astype(base_ref.dtype)


def _kernel_b(i1p_ref, i1c_ref, i1n_ref, basep_ref, basec_ref, basen_ref,
              feat_ref, wd2f, wd2b, b2, out_ref, bpart_ref,
              *, rows, c2, h, w, n_tsteps, tb):
    i = pl.program_id(1)
    ts = pl.program_id(2)
    c = i1c_ref.shape[-1]
    ring_valid, out_valid, row_valid = _masks(i, rows, c2, h, w)
    l2 = rows * c2

    @pl.when(ts == 0)
    def _base_once():
        basex = _assemble(basep_ref[0], basec_ref[0], basen_ref[0], row_valid)
        bp = _conv2d_flat_wcat(basex.reshape((rows + 2) * c2, c), wd2b[:], rows, c2)
        bpart_ref[:] = bp.astype(bpart_ref.dtype)

    for j in range(tb):
        i1x = _assemble(i1p_ref[0, j], i1c_ref[0, j], i1n_ref[0, j], row_valid)
        frame_part = _conv2d_flat_wcat(i1x.reshape((rows + 2) * c2, c), wd2f[:], rows, c2)
        i2 = _lrelu(
            frame_part + bpart_ref[:].astype(jnp.float32)
            + b2[:].astype(jnp.float32)
        )
        feat_flat = feat_ref[0, j].reshape(l2, c)
        # feat grid col c+2 == image col c == out flat col c.  The shift is
        # a sublane ROTATE (cheap) rather than a pad+slice relayout: the 2
        # wrapped-in tail values are feat grid cols 0/1 of the tile's first
        # row — zeros by the carried-layout invariant, and masked anyway.
        center = pltpu.roll(feat_flat.astype(jnp.float32), l2 - 2, 0)
        val = jnp.where(out_valid, center + i2, 0.0)
        # shift +2 back: out flat col c -> padded grid col c+2; the wrapped
        # head values are val's masked (zero) tail — exact.  (Mosaic only
        # rotates 32-bit data, so roll f32 and cast after.)
        val = pltpu.roll(val, 2, 0).astype(out_ref.dtype)
        out_ref[0, j] = val.reshape(rows, c2, c)


def pad_to_split_layout(feat, rows=8, sublane=16):
    """[B,T,H,W,C] -> [B,T,Hp,C2,C]; image at rows [0,H), cols [2,W+2)."""
    n, t, h, w, c = feat.shape
    hp = _round_up(h, rows)
    c2 = _round_up(w + 4, sublane)
    return jnp.pad(feat, ((0, 0), (0, 0), (0, hp - h), (2, c2 - w - 2), (0, 0)))


def unpad_from_split_layout(padded, h, w):
    return padded[:, :, :h, 2 : 2 + w, :]


def _specs(rows, tb, c2, c, hp):
    """(cur5, prev5, next5, cur4, prev4, next4) BlockSpecs for a given
    row-tile size."""
    u = rows // 2
    n_units = hp // 2
    cur5 = pl.BlockSpec((1, tb, rows, c2, c), lambda b, i, tt: (b, tt, i, 0, 0))
    prev5 = pl.BlockSpec(
        (1, tb, 2, c2, c), lambda b, i, tt: (b, tt, jnp.maximum(i * u - 1, 0), 0, 0)
    )
    next5 = pl.BlockSpec(
        (1, tb, 2, c2, c),
        lambda b, i, tt: (b, tt, jnp.minimum((i + 1) * u, n_units - 1), 0, 0),
    )
    cur4 = pl.BlockSpec((1, rows, c2, c), lambda b, i, tt: (b, i, 0, 0))
    prev4 = pl.BlockSpec(
        (1, 2, c2, c), lambda b, i, tt: (b, jnp.maximum(i * u - 1, 0), 0, 0)
    )
    next4 = pl.BlockSpec(
        (1, 2, c2, c),
        lambda b, i, tt: (b, jnp.minimum((i + 1) * u, n_units - 1), 0, 0),
    )
    return cur5, prev5, next5, cur4, prev4, next4


def _pfrb_split_pallas(padded, params, h, w, rows_a=8, rows_b=6, tb=2):
    w1, b1, wfuse, bfuse, w2f, w2b, b2 = params
    n, t, hp, c2, c = padded.shape
    assert t % tb == 0, (t, tb)
    assert hp % rows_a == 0 and hp % rows_b == 0, (hp, rows_a, rows_b)
    n_tsteps = t // tb
    dtype = padded.dtype
    wd1 = _pack_dydx(w1.astype(dtype))
    wd2f = _pack_dydx(w2f.astype(dtype))
    wd2b = _pack_dydx(w2b.astype(dtype))
    wspec = lambda arr: pl.BlockSpec(arr.shape, lambda b, i, tt: (0,) * arr.ndim)

    b1r = b1.reshape(1, -1).astype(jnp.float32)
    bfr = bfuse.reshape(1, -1).astype(jnp.float32)
    b2r = b2.reshape(1, -1).astype(jnp.float32)
    # frame-group layout for the one-dot fusion: [n_tsteps, tb*C, C]
    wfuse_c = wfuse.astype(dtype).reshape(n_tsteps, tb * c, c)

    interp = jax.default_backend() == "cpu"

    cur5, prev5, next5, cur4, _, _ = _specs(rows_a, tb, c2, c, hp)
    i1, base = pl.pallas_call(
        functools.partial(_kernel_a, rows=rows_a, c2=c2, h=h, w=w,
                          n_tsteps=n_tsteps, tb=tb),
        grid=(n, hp // rows_a, n_tsteps),
        in_specs=[prev5, cur5, next5, wspec(wd1), wspec(b1r), wspec(wfuse_c),
                  wspec(bfr)],
        out_specs=(cur5, cur4),
        out_shape=(
            jax.ShapeDtypeStruct((n, t, hp, c2, c), dtype),
            jax.ShapeDtypeStruct((n, hp, c2, c), dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interp,
    )(padded, padded, padded, wd1, b1r, wfuse_c, bfr)

    cur5b, prev5b, next5b, cur4b, prev4b, next4b = _specs(rows_b, tb, c2, c, hp)
    out = pl.pallas_call(
        functools.partial(_kernel_b, rows=rows_b, c2=c2, h=h, w=w,
                          n_tsteps=n_tsteps, tb=tb),
        grid=(n, hp // rows_b, n_tsteps),
        in_specs=[prev5b, cur5b, next5b, prev4b, cur4b, next4b, cur5b,
                  wspec(wd2f), wspec(wd2b), wspec(b2r)],
        out_specs=cur5b,
        out_shape=jax.ShapeDtypeStruct((n, t, hp, c2, c), dtype),
        scratch_shapes=[pltpu.VMEM((rows_b * c2, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interp,
    )(i1, i1, i1, base, base, base, padded, wd2f, wd2b, b2r)
    return out


@jax.custom_vjp
def pfrb_chain_split(feat, params_list):
    """N fused PFRBs (two-kernel pipeline), XLA gradient.

    T is padded to a multiple of the per-program frame-pair size; padded
    frames carry zero fusion weights so they never affect real frames and
    are dropped at unpad."""
    n, t, h, w, c = feat.shape
    rows_a, rows_b, tb = 16, 16, 4
    tp = _round_up(t, tb)
    padded = pad_to_split_layout(feat, rows=16)  # lcm(16,16)
    if tp != t:
        padded = jnp.pad(padded, ((0, 0), (0, tp - t), (0, 0), (0, 0), (0, 0)))
    for p in params_list:
        if tp != t:
            w1, b1, wfuse, bfuse, w2f, w2b, b2 = p
            wfuse = jnp.pad(wfuse, ((0, tp - t), (0, 0), (0, 0)))
            p = (w1, b1, wfuse, bfuse, w2f, w2b, b2)
        padded = _pfrb_split_pallas(padded, p, h, w, rows_a, rows_b, tb=tb)
    return unpad_from_split_layout(padded[:, :t], h, w)


def _fwd(feat, params_list):
    return pfrb_chain_split(feat, params_list), (feat, params_list)


def _bwd(res, g):
    feat, params_list = res
    _, vjp = jax.vjp(pfrb_chain_xla, feat, params_list)
    return vjp(g)


pfrb_chain_split.defvjp(_fwd, _bwd)
