"""Pallas backward kernels for the pair-packed PFRB chain.

The forward (ops/pallas/pfrb_pack.py) saves each block's input `feat`,
`i1` and `base` (kernel A produces i1/base anyway).  This module computes
the block gradient with the SAME pair-packed conv machinery: a transposed
SAME conv is a SAME conv with the spatially mirrored channel-transposed
kernel, and the pack grid's (+1,+1) shift per conv composes so that

  * conv(dz2_carried, mirT(W2f)) lands on the i1 grid (d_i1) directly;
  * conv(dz1_i1grid, mirT(W1)) lands on "flat col == image col" and is
    shifted back (+1 pair) to the carried layout, like forward kernel B.

Grid-alignment of the conv-output cotangents: forward kernel B's conv
output sits at "flat col == image col" and was rolled +1 pair into the
carried layout — so dz2 must be rolled BACK (lp-1) before acting as the
conv2 cotangent; kernel A's conv output is the i1 grid itself, so dz1
needs no roll.

Weight gradients: dWpk = sum_q t3[q] (x) dO[q] accumulated into a
REVISITED [6C, 4F] f32 output across the whole grid (constant index
map); the fused-dot cotangent is rebuilt from the conv cotangent by the
transpose of the output roll (dO = [dco | roll(dco, +1)]).  Every kernel
entry appears at exactly two packed cells; `unpack_pair_grad` folds them
back to [3,3,C,F].
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pfnl_tpu.ops.pallas.common import _prec
from pfnl_tpu.ops.pallas.pfrb_pack import (
    _assemble, _conv2d_pack, _masks_pack, _pack_pair, _row_valid_pack, _specs,
)


def mirror_t(w):
    """[3,3,C,F] -> [3,3,F,C]: the transposed-conv kernel."""
    return w[::-1, ::-1].transpose(0, 1, 3, 2)


def unpack_pair_grad(dwp, c=64, f=64):
    """[6C, 4F] packed-weight gradient -> [3,3,C,F] (see _pack_pair):
      w[dy,0]: (even,self_even), (odd,self_odd)
      w[dy,1]: (odd,self_even), (even,next_odd)
      w[dy,2]: (even,next_even), (odd,next_odd)"""
    dwp = dwp.reshape(3, 2, c, 4, f)  # (dy, parity, cin, colblock, f)
    return jnp.stack(
        [
            dwp[:, 0, :, 0] + dwp[:, 1, :, 1],   # dx=0
            dwp[:, 1, :, 0] + dwp[:, 0, :, 3],   # dx=1
            dwp[:, 0, :, 2] + dwp[:, 1, :, 3],   # dx=2
        ],
        axis=1,
    )


def _wgrad_dot(t3, dco):
    """t3 [Lp, 6C] x conv-output cotangent dco [Lp, 2F] -> packed dW
    [6C, 4F]; dO rebuilt as [dco | roll(dco, +1)] (transpose of the
    forward output roll; Mosaic rotates 32-bit data only, so roll f32)."""
    rolled = pltpu.roll(dco.astype(jnp.float32), 1, 0).astype(dco.dtype)
    do = jnp.concatenate([dco, rolled], axis=-1)
    return jax.lax.dot_general(
        t3, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_prec(t3.dtype),
    )


def _kernel_bwd_b(dz2p_ref, dz2c_ref, dz2n_ref, i1p_ref, i1c_ref, i1n_ref,
                  basep_ref, basec_ref, basen_ref, w2ft, w2bt,
                  di1_ref, dbase_ref, dw2f_ref, dw2b_ref, db2_ref,
                  dzsum_ref,
                  *, rows, c2p, h, w, n_tsteps, tb):
    b = pl.program_id(0)
    i = pl.program_id(1)
    ts = pl.program_id(2)
    first = (b == 0) & (i == 0) & (ts == 0)
    cl = dz2c_ref.shape[-1]
    ring_valid, _ = _masks_pack(i, rows, c2p, h, w)
    row_valid = _row_valid_pack(i, rows, c2p, h)
    lp = rows * c2p
    lp1 = (rows + 2) * c2p

    @pl.when(first)
    def _zero_accs():
        dw2f_ref[:] = jnp.zeros_like(dw2f_ref)
        dw2b_ref[:] = jnp.zeros_like(dw2b_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    @pl.when(ts == 0)
    def _zero_sum():
        dzsum_ref[:] = jnp.zeros_like(dzsum_ref)

    dw2f_acc = jnp.zeros(dw2f_ref.shape, jnp.float32)
    db2_acc = jnp.zeros((1, cl), jnp.float32)
    for j in range(tb):
        dz2x = _assemble(dz2p_ref[0, j], dz2c_ref[0, j], dz2n_ref[0, j],
                         row_valid)
        dz2f = dz2x.reshape(lp1, cl)
        dzsum_ref[:] = dzsum_ref[:] + dz2f.astype(jnp.float32)
        # d_i1 partial: transposed conv of carried-layout dz2 -> i1 grid
        dco = _conv2d_pack(dz2f, w2ft[:], rows, c2p)
        di1 = jnp.where(ring_valid, dco, 0.0)
        di1_ref[0, j] = di1.reshape(rows, c2p, cl).astype(di1_ref.dtype)
        # conv2's OUTPUT cotangent: dz2 rolled back from the carried
        # layout to the conv-output grid ("flat col == image col")
        dz2flat = dz2c_ref[0, j].reshape(lp, cl).astype(jnp.float32)
        dco_c = pltpu.roll(dz2flat, lp - 1, 0).astype(i1c_ref.dtype)
        i1x = _assemble(i1p_ref[0, j], i1c_ref[0, j], i1n_ref[0, j], row_valid)
        i1f = i1x.reshape(lp1, cl)
        t3 = jnp.concatenate(
            [i1f[0:lp], i1f[c2p:c2p + lp], i1f[2 * c2p:2 * c2p + lp]], -1)
        dw2f_acc = dw2f_acc + _wgrad_dot(t3, dco_c)
        db2_acc = db2_acc + jnp.sum(dz2flat, axis=0, keepdims=True)
    dw2f_ref[:] = dw2f_ref[:] + dw2f_acc
    db2_ref[:] = db2_ref[:] + db2_acc

    @pl.when(ts == n_tsteps - 1)
    def _finish_base():
        dzs = dzsum_ref[:].astype(basec_ref.dtype)
        dco_b = _conv2d_pack(dzs, w2bt[:], rows, c2p)
        dbase = jnp.where(ring_valid, dco_b, 0.0)
        dbase_ref[0] = dbase.reshape(rows, c2p, cl).astype(dbase_ref.dtype)
        basex = _assemble(basep_ref[0], basec_ref[0], basen_ref[0], row_valid)
        bf = basex.reshape(lp1, cl)
        t3b = jnp.concatenate(
            [bf[0:lp], bf[c2p:c2p + lp], bf[2 * c2p:2 * c2p + lp]], -1)
        dzs_c = pltpu.roll(
            dzsum_ref[:][c2p:c2p + lp], lp - 1, 0).astype(basec_ref.dtype)
        dw2b_ref[:] = dw2b_ref[:] + _wgrad_dot(t3b, dzs_c)


def _kernel_bwd_a(dz1p_ref, dz1c_ref, dz1n_ref, featp_ref, featc_ref,
                  featn_ref, g_ref, w1t,
                  dfeat_ref, dw1_ref, db1_ref,
                  *, rows, c2p, h, w, n_tsteps, tb):
    b = pl.program_id(0)
    i = pl.program_id(1)
    ts = pl.program_id(2)
    first = (b == 0) & (i == 0) & (ts == 0)
    cl = dz1c_ref.shape[-1]
    _, out_valid = _masks_pack(i, rows, c2p, h, w)
    row_valid = _row_valid_pack(i, rows, c2p, h)
    lp = rows * c2p
    lp1 = (rows + 2) * c2p

    @pl.when(first)
    def _zero_accs():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)

    dw1_acc = jnp.zeros(dw1_ref.shape, jnp.float32)
    db1_acc = jnp.zeros((1, cl), jnp.float32)
    for j in range(tb):
        dz1x = _assemble(dz1p_ref[0, j], dz1c_ref[0, j], dz1n_ref[0, j],
                         row_valid)
        dz1f = dz1x.reshape(lp1, cl)
        dco = _conv2d_pack(dz1f, w1t[:], rows, c2p)
        # result: flat col == image col; mask then shift back (+1 pair)
        # to the carried layout (same as forward kernel B's output)
        val = jnp.where(out_valid, dco, 0.0)
        val = pltpu.roll(val, 1, 0)
        dfeat_ref[0, j] = (
            g_ref[0, j].reshape(lp, cl).astype(jnp.float32) + val
        ).reshape(rows, c2p, cl).astype(dfeat_ref.dtype)
        # conv1's output grid IS the i1 grid — dz1 needs no roll
        featx = _assemble(featp_ref[0, j], featc_ref[0, j], featn_ref[0, j],
                          row_valid)
        ff = featx.reshape(lp1, cl)
        t3 = jnp.concatenate(
            [ff[0:lp], ff[c2p:c2p + lp], ff[2 * c2p:2 * c2p + lp]], -1)
        dz1_c = dz1c_ref[0, j].reshape(lp, cl)
        dw1_acc = dw1_acc + _wgrad_dot(t3, dz1_c)
        db1_acc = db1_acc + jnp.sum(dz1_c.astype(jnp.float32), axis=0,
                                    keepdims=True)
    dw1_ref[:] = dw1_ref[:] + dw1_acc
    db1_ref[:] = db1_ref[:] + db1_acc


def _run_bwd_b(dz2, i1, base, w2f, w2b, h, w, rows, tb):
    n, t, hp, c2p, cl = dz2.shape
    c = cl // 2
    n_tsteps = t // tb
    dtype = dz2.dtype
    w2ftp = _pack_pair(mirror_t(w2f).astype(dtype))
    w2btp = _pack_pair(mirror_t(w2b).astype(dtype))
    wspec = lambda arr: pl.BlockSpec(arr.shape, lambda b, i, tt: (0,) * arr.ndim)
    accspec = lambda shape: pl.BlockSpec(shape, lambda b, i, tt: (0,) * len(shape))
    cur5, prev5, next5, cur4, prev4, next4 = _specs(rows, tb, c2p, cl, hp)
    return pl.pallas_call(
        functools.partial(_kernel_bwd_b, rows=rows, c2p=c2p, h=h, w=w,
                          n_tsteps=n_tsteps, tb=tb),
        grid=(n, hp // rows, n_tsteps),
        in_specs=[prev5, cur5, next5, prev5, cur5, next5, prev4, cur4, next4,
                  wspec(w2ftp), wspec(w2btp)],
        out_specs=(cur5, cur4, accspec((6 * c, 4 * c)), accspec((6 * c, 4 * c)),
                   accspec((1, cl))),
        out_shape=(
            jax.ShapeDtypeStruct((n, t, hp, c2p, cl), dtype),
            jax.ShapeDtypeStruct((n, hp, c2p, cl), dtype),
            jax.ShapeDtypeStruct((6 * c, 4 * c), jnp.float32),
            jax.ShapeDtypeStruct((6 * c, 4 * c), jnp.float32),
            jax.ShapeDtypeStruct((1, cl), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM(((rows + 2) * c2p, cl), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(dz2, dz2, dz2, i1, i1, i1, base, base, base, w2ftp, w2btp)


def _run_bwd_a(dz1, feat, g, w1, h, w, rows, tb):
    n, t, hp, c2p, cl = dz1.shape
    c = cl // 2
    n_tsteps = t // tb
    dtype = dz1.dtype
    w1tp = _pack_pair(mirror_t(w1).astype(dtype))
    wspec = lambda arr: pl.BlockSpec(arr.shape, lambda b, i, tt: (0,) * arr.ndim)
    accspec = lambda shape: pl.BlockSpec(shape, lambda b, i, tt: (0,) * len(shape))
    cur5, prev5, next5, cur4, prev4, next4 = _specs(rows, tb, c2p, cl, hp)
    return pl.pallas_call(
        functools.partial(_kernel_bwd_a, rows=rows, c2p=c2p, h=h, w=w,
                          n_tsteps=n_tsteps, tb=tb),
        grid=(n, hp // rows, n_tsteps),
        in_specs=[prev5, cur5, next5, prev5, cur5, next5, cur5, wspec(w1tp)],
        out_specs=(cur5, accspec((6 * c, 4 * c)), accspec((1, cl))),
        out_shape=(
            jax.ShapeDtypeStruct((n, t, hp, c2p, cl), dtype),
            jax.ShapeDtypeStruct((6 * c, 4 * c), jnp.float32),
            jax.ShapeDtypeStruct((1, cl), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(dz1, dz1, dz1, feat, feat, feat, g, w1tp)


_ALPHA = 0.2


def _fuse_packed_t(wfuse, c):
    """[T, C, C] -> [T, 2C, 2C] block-diagonal TRANSPOSED fusion weights
    for the packed d_i1 += dzb @ Wf^T step."""
    t = wfuse.shape[0]
    z = jnp.zeros((c, c), wfuse.dtype)
    wt = jnp.swapaxes(wfuse, 1, 2)
    return jnp.stack([
        jnp.concatenate([
            jnp.concatenate([wt[i], z], 1),
            jnp.concatenate([z, wt[i]], 1),
        ], 0)
        for i in range(t)
    ])


def chain_bwd_pallas(feats_p, i1s_p, bases_p, params_list, g, h, w, rows, tb):
    """Full-chain backward on the packed residuals.  feats_p has
    nblocks+1 entries (inputs then final output); g: cotangent in the
    UNPACKED [N,T,H,W,C] layout.  Returns (d_feat unpacked, param grads
    list)."""
    from pfnl_tpu.ops.pallas.pfrb_pack import (
        pad_to_pack_layout, unpad_from_pack_layout,
    )

    nb = len(params_list)
    n, t, hh, ww, c = g.shape
    tp = feats_p[0].shape[1]
    ct = feats_p[0].dtype
    gp = pad_to_pack_layout(g.astype(ct), rows=rows)
    if tp != t:
        gp = jnp.pad(gp, ((0, 0), (0, tp - t), (0, 0), (0, 0), (0, 0)))

    alpha = jnp.asarray(_ALPHA, ct)
    one = jnp.asarray(1.0, ct)
    mask = lambda y: jnp.where(y > 0, one, alpha)

    d_out = gp
    d_params = []
    for k in reversed(range(nb)):
        w1, b1, wfuse, bfuse, w2f, w2b, b2 = params_list[k]
        feat, i1, base = feats_p[k], i1s_p[k], bases_p[k]
        out = feats_p[k + 1]
        dz2 = d_out * mask(out - feat)
        di1p, dbase, dw2fp, dw2bp, db2p = _run_bwd_b(
            dz2, i1, base, w2f, w2b, h, w, rows, tb)
        dzb = dbase * mask(base)                       # [n, hp, c2p, 128]
        wftp = _fuse_packed_t(wfuse.astype(ct), c)     # [t, 128, 128]
        if tp != t:
            wftp = jnp.pad(wftp, ((0, tp - t), (0, 0), (0, 0)))
        d_i1 = di1p + jnp.einsum("nhpc,tcd->nthpd", dzb, wftp,
                                 precision=_prec(ct)).astype(ct)
        dwfuse_pk = jnp.einsum("nthpc,nhpd->tcd", i1[:, :t], dzb,
                               preferred_element_type=jnp.float32,
                               precision=_prec(ct))     # [t, 128, 128]
        dwfuse = (dwfuse_pk[:, :c, :c] + dwfuse_pk[:, c:, c:])
        dbfuse_pk = jnp.sum(dzb.astype(jnp.float32), axis=(0, 1, 2))
        dbfuse = dbfuse_pk[:c] + dbfuse_pk[c:]
        dz1 = d_i1 * mask(i1)
        d_feat, dw1p, db1p = _run_bwd_a(dz1, feat, d_out, w1, h, w, rows, tb)
        d_params.append(tuple(
            x.astype(p.dtype) for x, p in zip(
                (
                    unpack_pair_grad(dw1p, c, c),
                    db1p[0, :c] + db1p[0, c:],
                    dwfuse,
                    dbfuse,
                    unpack_pair_grad(dw2fp, c, c),
                    unpack_pair_grad(dw2bp, c, c),
                    db2p[0, :c] + db2p[0, c:],
                ),
                params_list[k])
        ))
        d_out = d_feat
    d_feat_u = unpad_from_pack_layout(d_out[:, :t], h, w).astype(g.dtype)
    return d_feat_u, list(reversed(d_params))
