"""PFNL head-merge ("tail") as one Pallas kernel on the pair-packed grid.

The reference tail (model/pfnl.py:73-78) is:

    merge = lrelu(conv3x3(concat_t(feat_t) @448, Wm1))       # 448 -> 48
    out1  = conv3x3(depth_to_space(merge, 2), Wm2)           # 12 -> 12 @2x
    out   = depth_to_space(out1, 2)                          # -> 3 @4x

Executed in XLA on the unpacked activation this costs ~17 ms at batch 16
(plus ~3 ms to unpad/transpose the chain output).  This kernel consumes
the PFRB chain's packed [B,T,Hp,C2/2,128] activation DIRECTLY:

  * the 448-channel merge conv is one pair-packed dot (K = 3dy * 7frames
    * 128 = 2688, N = 2*2*48 = 192) + one sublane rotate — the pfrb_pack
    conv scheme with frame-grouped input lanes;
  * convmerge2-after-depth_to_space is FOLDED onto the LR grid: d2s then
    3x3 conv at 2x equals a 3x3-support conv on the LR grid whose 48->48
    kernel is a phase scatter of the 12->12 HR kernel (`_fold_d2s_conv`),
    so no intermediate 2x activation exists;
  * output is the 48-channel LR-grid map (12 channels x 4 phases); the
    final double depth_to_space to [B,4H,4W,3] and the bicubic add are a
    cheap XLA reshape/transpose outside (`compose_d2s4`).

The merge activation is computed with one halo row of slack (rows+2) so
the folded conv needs no cross-program communication.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pfnl_tpu.ops.pallas.common import _lrelu, _prec


def _pack_pair_groups(w: jax.Array, group: int = 64) -> jax.Array:
    """[3,3,Cin,F] -> [3*2*Cin, 4F] pair-packed dot matrix; input lane
    order (dy, cin-group, parity, cin%group) — matching a t3 built from
    lane-concatenated 2*group-wide packed streams.  Column layout:
    [self_even F | self_odd F | next_even F | next_odd F]."""
    kh, kw, cin, f = w.shape
    z = jnp.zeros((group, f), w.dtype)
    rows = []
    for dy in range(3):
        for g0 in range(0, cin, group):
            we = [w[dy, dx, g0:g0 + group, :] for dx in range(3)]
            rows.append(jnp.concatenate([we[0], z, we[2], we[1]], axis=1))
            rows.append(jnp.concatenate([we[1], we[0], z, we[2]], axis=1))
    return jnp.concatenate(rows, axis=0)


def _fold_d2s_conv(km2: np.ndarray) -> np.ndarray:
    """Fold conv3x3-after-depth_to_space(2) onto the LR grid.

    km2: [3,3,C12,C12] HR kernel.  Returns [3,3,4*C12,4*C12] LR kernel K
    with K[dy_lr+1, dx_lr+1, s*C12+ci, p*C12+co] accumulating the HR
    taps, where s=(sr*2+sc) is the d2s sub-pixel group of the input and
    p=(pr*2+pc) the output phase."""
    c12 = km2.shape[-1]
    out = np.zeros((3, 3, 4 * c12, 4 * c12), km2.dtype)
    for pr in range(2):
        for pc in range(2):
            for dy in range(3):
                for dx in range(3):
                    ry, rx = pr + dy - 1, pc + dx - 1     # HR offset from 2r/2c
                    sr, sc = ry % 2, rx % 2               # input sub-pixel
                    dy_lr, dx_lr = (ry - sr) // 2, (rx - sc) // 2
                    s, p = sr * 2 + sc, pr * 2 + pc
                    out[dy_lr + 1, dx_lr + 1,
                        s * c12:(s + 1) * c12,
                        p * c12:(p + 1) * c12] += km2[dy, dx]
    return out


def _mask(nrows, c2p, h, w, width, par, row_off, col_lo, col_hi):
    """[nrows*c2p, width] image-support mask; col = 2*pair + lane//par;
    global image row = row_off + flat row."""
    lp = nrows * c2p
    q = jax.lax.broadcasted_iota(jnp.int32, (lp, width), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (lp, width), 1)
    r = q // c2p
    col = 2 * (q - r * c2p) + lane // par
    g = row_off + r
    return (col >= col_lo) & (col <= col_hi) & (g >= 0) & (g < h)


def _conv_pack_dot(t3, wpk, lp):
    o = jax.lax.dot_general(
        t3, wpk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_prec(t3.dtype)
    )
    half = wpk.shape[-1] // 2
    return o[:, 0:half] + pltpu.roll(o[:, half:], lp - 1, 0)


def _kernel(prev_ref, cur_ref, next_ref, wm1, bm1, wf2, bf2, out_ref,
            *, rows, c2p, h, w, t):
    i = pl.program_id(1)
    cl = cur_ref.shape[-1]
    rr = jax.lax.broadcasted_iota(jnp.int32, (rows + 4, 1, 1), 0)
    grow = i * rows - 2 + rr
    row_valid = (grow >= 0) & (grow < h)
    lp1 = (rows + 2) * c2p      # merge rows (1 halo row each side)
    lp2 = rows * c2p            # final rows

    frames = []
    for f in range(t):
        x = jnp.concatenate(
            [prev_ref[0, f], cur_ref[0, f], next_ref[0, f]], axis=0
        )
        frames.append(jnp.where(row_valid, x, 0))
    xcat = jnp.concatenate(frames, axis=-1)             # [rows+4, c2p, t*cl]
    x2 = xcat.reshape((rows + 4) * c2p, t * cl)

    t3 = jnp.concatenate(
        [x2[0:lp1], x2[c2p:c2p + lp1], x2[2 * c2p:2 * c2p + lp1]], axis=-1
    )
    # wm1 is packed with 64 output channels per parity (48 real + 16 zero
    # pads) so m1 lands directly in the 128-lane packed layout
    m1 = _conv_pack_dot(t3, wm1[:], lp1) + bm1[:].astype(jnp.float32)
    # m1 flat row r1 is global row i*rows-1+r1; grid col c <-> image col c-1
    m1_valid = _mask(rows + 2, c2p, h, w, 128, 64, i * rows - 1, 1, w)
    m1p = jnp.where(m1_valid, _lrelu(m1), 0.0).astype(cur_ref.dtype)

    t3b = jnp.concatenate(
        [m1p[0:lp2], m1p[c2p:c2p + lp2], m1p[2 * c2p:2 * c2p + lp2]], axis=-1
    )
    o2 = _conv_pack_dot(t3b, wf2[:], lp2) + bf2[:].astype(jnp.float32)
    out_valid = _mask(rows, c2p, h, w, o2.shape[-1], o2.shape[-1] // 2,
                      i * rows, 0, w - 1)
    o2 = jnp.where(out_valid, o2, 0.0)
    out_ref[0] = o2.reshape(rows, c2p, o2.shape[-1]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("t", "h", "w", "rows"))
def pfnl_tail_pack(packed, wm1, bm1, km2, bm2, *, t, h, w, rows=16):
    """packed: [B,TP,Hp,C2P,128] chain output (first `t` frames real).
    wm1 [3,3,t*64,48], km2 [3,3,12,12].  Returns the folded 48-channel LR
    map [B, h, w, 48] with channel layout (pr*2+pc)*12 + c12."""
    n, tp, hp, c2p, cl = packed.shape
    dtype = packed.dtype
    c12 = km2.shape[-1]
    nphase = 4 * c12  # 48

    # pad merge output channels 48->64 so m1 is born in packed 128-lane
    # layout (Mosaic cannot cheaply re-pad 96->128 lanes in-kernel)
    wm1_64 = jnp.pad(wm1, ((0, 0), (0, 0), (0, 0), (0, 64 - nphase)))
    bm1_64 = jnp.pad(bm1, (0, 64 - nphase))
    wm1p = _pack_pair_groups(wm1_64.astype(dtype))               # [2688, 256]
    # fold convmerge2 onto the LR grid (traceable: static-index scatter)
    kfj = jnp.zeros((3, 3, nphase, nphase), jnp.float32)
    for pr in range(2):
        for pc in range(2):
            for dy in range(3):
                for dx in range(3):
                    ry, rx = pr + dy - 1, pc + dx - 1
                    sr, sc = ry % 2, rx % 2
                    dy_lr, dx_lr = (ry - sr) // 2, (rx - sc) // 2
                    s, p = sr * 2 + sc, pr * 2 + pc
                    kfj = kfj.at[dy_lr + 1, dx_lr + 1,
                                 s * c12:(s + 1) * c12,
                                 p * c12:(p + 1) * c12].add(
                        km2[dy, dx].astype(jnp.float32))
    # pad input channels 48->64 so the in-kernel lane concat is 128-aligned
    kf_in64 = jnp.zeros((3, 3, 64, nphase), jnp.float32).at[:, :, :nphase, :].set(kfj)
    wf2p = _pack_pair_groups(kf_in64.astype(dtype), group=64)    # [384, 192]

    bm1r = jnp.tile(bm1_64.reshape(1, -1), (1, 2)).astype(jnp.float32)  # [1, 128]
    bf = jnp.tile(bm2.reshape(1, -1), (1, 4))                         # [1, 48]
    bfr = jnp.tile(bf, (1, 2)).astype(jnp.float32)                    # [1, 96]

    u = rows // 2
    n_units = hp // 2
    cur5 = pl.BlockSpec((1, t, rows, c2p, cl), lambda b, i: (b, 0, i, 0, 0))
    prev5 = pl.BlockSpec(
        (1, t, 2, c2p, cl), lambda b, i: (b, 0, jnp.maximum(i * u - 1, 0), 0, 0)
    )
    next5 = pl.BlockSpec(
        (1, t, 2, c2p, cl),
        lambda b, i: (b, 0, jnp.minimum((i + 1) * u, n_units - 1), 0, 0),
    )
    wspec = lambda arr: pl.BlockSpec(arr.shape, lambda b, i: (0,) * arr.ndim)

    out = pl.pallas_call(
        functools.partial(_kernel, rows=rows, c2p=c2p, h=h, w=w, t=t),
        grid=(n, hp // rows),
        in_specs=[prev5, cur5, next5, wspec(wm1p), wspec(bm1r), wspec(wf2p),
                  wspec(bfr)],
        out_specs=pl.BlockSpec((1, rows, c2p, 2 * nphase),
                               lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, hp, c2p, 2 * nphase), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=jax.default_backend() == "cpu",
    )(packed, packed, packed, wm1p, bm1r, wf2p, bfr)

    # unpack pairs, drop padding: out grid col c == image col c
    out = out.reshape(n, hp, 2 * c2p, nphase)[:, :h, :w, :]
    return out


def compose_d2s4(folded):
    """[B,h,w,48] folded map -> [B,4h,4w,3]: the double depth_to_space the
    kernel folded away.  Channel layout (pr,pc,(s2r,s2c,c3))."""
    n, h, w, _ = folded.shape
    x = folded.reshape(n, h, w, 2, 2, 2, 2, 3)  # (pr, pc, s2r, s2c, c3)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)    # n,h,pr,s2r,w,pc,s2c,c3
    return x.reshape(n, 4 * h, 4 * w, 3)


def _xla_tail_only(feat5, wm1, bm1, km2, bm2):
    """XLA composition of the merge tail alone (identical math to the
    packed tail kernel) — the backward's recompute surface is only this
    cheap head, never the 20-block chain."""
    from pfnl_tpu.ops.shuffle import depth_to_space

    n, t, h, w, c = feat5.shape
    merge = feat5.transpose(0, 2, 3, 1, 4).reshape(n, h, w, t * c)
    conv = lambda x, k: jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    m = _lrelu(conv(merge, wm1) + bm1.astype(merge.dtype))
    o = conv(depth_to_space(m, 2), km2) + bm2.astype(merge.dtype)
    return depth_to_space(o, 2)


def _xla_blocks_tail(feat, params_list, wm1, bm1, km2, bm2):
    """XLA oracle composition (tests): PFRB chain + merge tail."""
    from pfnl_tpu.ops.pallas.pfrb_xla import pfrb_chain_xla

    return _xla_tail_only(pfrb_chain_xla(feat, params_list), wm1, bm1, km2, bm2)


@jax.custom_vjp
def blocks_and_tail_pack(feat, params_list, wm1, bm1, km2, bm2):
    """PFRB chain + merge tail entirely on the pair-packed layout (no
    unpack/transpose between the blocks and the head-merge convs).
    feat: [N,T,H,W,64] -> [N,4H,4W,3] (pre-bicubic).

    Gradient: the chain portion is the recompute-free Pallas backward
    consuming kernel A's saved (feat, i1, base) activations; only the
    merge tail re-runs (one XLA vjp of `_xla_tail_only`)."""
    from pfnl_tpu.ops.pallas.pfrb_pack import _chain_pack_run, pick_rows

    n, t, h, w, c = feat.shape
    out, (feats_p, _, _) = _chain_pack_run(feat, params_list, collect=False,
                                           keep_final_packed=True)
    folded = pfnl_tail_pack(feats_p[-1], wm1, bm1, km2, bm2, t=t, h=h, w=w,
                            rows=pick_rows(h))
    return compose_d2s4(folded)


def _bt_fwd(feat, params_list, wm1, bm1, km2, bm2):
    from pfnl_tpu.ops.pallas.pfrb_pack import _chain_pack_run, pick_rows

    n, t, h, w, c = feat.shape
    _, (feats_p, i1s_p, bases_p) = _chain_pack_run(
        feat, params_list, collect=True)
    folded = pfnl_tail_pack(feats_p[-1], wm1, bm1, km2, bm2, t=t, h=h, w=w,
                            rows=pick_rows(h))
    out = compose_d2s4(folded)
    return out, (feats_p, i1s_p, bases_p, params_list, wm1, bm1, km2, bm2,
                 (t, h, w))


def _bt_bwd(res, g):
    from pfnl_tpu.ops.pallas.pfrb_pack import (
        _chain_bwd_dispatch, unpad_from_pack_layout)

    feats_p, i1s_p, bases_p, params_list, wm1, bm1, km2, bm2, (t, h, w) = res
    feat5 = unpad_from_pack_layout(feats_p[-1][:, :t], h, w)
    _, tail_vjp = jax.vjp(_xla_tail_only, feat5, wm1, bm1, km2, bm2)
    d_feat5, d_wm1, d_bm1, d_km2, d_bm2 = tail_vjp(g)
    d_feat, d_params = _chain_bwd_dispatch(
        (feats_p, i1s_p, bases_p, params_list), d_feat5)
    return d_feat, d_params, d_wm1, d_bm1, d_km2, d_bm2


blocks_and_tail_pack.defvjp(_bt_fwd, _bt_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def blocks_and_tail_prepacked(packed, params_list, wm1, bm1, km2, bm2,
                              t, h, w):
    """blocks_and_tail_pack for an input BORN in the packed layout
    (conv0_packed): the chain consumes it directly — no pad/reshape pass
    exists anywhere between conv0 and the merge tail.
    packed: [N,T,Hp,C2/2,128] -> [N,4H,4W,3] (pre-bicubic)."""
    from pfnl_tpu.ops.pallas.pfrb_pack import _chain_pack_run, pick_rows

    out, (feats_p, _, _) = _chain_pack_run(
        packed, params_list, collect=False, keep_final_packed=True,
        prepacked_thw=(t, h, w))
    folded = pfnl_tail_pack(feats_p[-1], wm1, bm1, km2, bm2, t=t, h=h, w=w,
                            rows=pick_rows(h))
    return compose_d2s4(folded)


def _btp_fwd(packed, params_list, wm1, bm1, km2, bm2, t, h, w):
    from pfnl_tpu.ops.pallas.pfrb_pack import _chain_pack_run, pick_rows

    _, (feats_p, i1s_p, bases_p) = _chain_pack_run(
        packed, params_list, collect=True, prepacked_thw=(t, h, w))
    folded = pfnl_tail_pack(feats_p[-1], wm1, bm1, km2, bm2, t=t, h=h, w=w,
                            rows=pick_rows(h))
    out = compose_d2s4(folded)
    return out, (feats_p, i1s_p, bases_p, params_list, wm1, bm1, km2, bm2)


def _btp_bwd(t, h, w, res, g):
    from pfnl_tpu.ops.pallas.pfrb_pack import (
        _chain_bwd_dispatch, pad_to_pack_layout, pick_rows,
        unpad_from_pack_layout)

    feats_p, i1s_p, bases_p, params_list, wm1, bm1, km2, bm2 = res
    feat5 = unpad_from_pack_layout(feats_p[-1][:, :t], h, w)
    _, tail_vjp = jax.vjp(_xla_tail_only, feat5, wm1, bm1, km2, bm2)
    d_feat5, d_wm1, d_bm1, d_km2, d_bm2 = tail_vjp(g)
    d_feat, d_params = _chain_bwd_dispatch(
        (feats_p, i1s_p, bases_p, params_list), d_feat5)
    # cotangent w.r.t. the packed input: the pack transform is linear and
    # the chain reads padding regions only through zero masks, so their
    # gradient is exactly zero — pad_to_pack_layout IS the transpose.
    d_packed = pad_to_pack_layout(d_feat.astype(feats_p[0].dtype),
                                  rows=pick_rows(h))
    return d_packed, d_params, d_wm1, d_bm1, d_km2, d_bm2


blocks_and_tail_prepacked.defvjp(_btp_fwd, _btp_bwd)
