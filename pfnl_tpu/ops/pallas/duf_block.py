"""Fused DUF dense-block chain: the whole backbone loop
(BN-relu-1x1x1-BN-relu-3x3x3-concat, reference model/nets.py:9-150) as
one Pallas kernel per block over a persistent lane-aligned buffer.

Why: with per-op lowering the XLA glue dominates the 52-layer backbone —
measured per 720p frame (v5e, bf16): channel concats 40 ms, pads 19 ms,
BN/1x1x1-conv fusions 108 ms, vs 32 ms of actual 3x3x3 conv kernels.
Every op pays relayout/copy costs because the growing channel count
(64+16r) is never lane-aligned.  This kernel removes ALL of it:

  * one zero-initialized HBM buffer `xbuf` [B, T+2, Hp, Wp, C] holds the
    growing concat with T/H/W zero padding built in; C = the FINAL
    channel count rounded to 128 lanes, so every DMA is tile-aligned;
  * per block, each input t-plane is DMA'd once per row tile (128-lane
    aligned slice 0:Fc), the pointwise chain (BN-a, relu, 1x1x1 conv,
    BN-b folded with the conv bias, relu) runs in VMEM, and the 3x3x3
    growth conv uses the tap-packed dot of ops/pallas/duf_dense.py
    (temporal taps = 3 accumulated dots, spatial taps = output columns,
    N = 9G lanes, zero structural-zero FLOPs) with dh/dw reduced
    in-kernel (the row tile carries a 1-row halo);
  * the G new channels are appended by a read-modify-write of the single
    128-lane group containing lanes [F, F+G) — no concat ever happens;
  * the temporally-VALID tail blocks (T shrinking 7->1, nets.py:129) are
    the same kernel with a narrower output plane window; pad planes of
    the input window are forced to zero a-values exactly like the
    reference's pad-after-activation ordering.

BN folding (inference): a = relu(sa*x + oa), sa = gamma*rsqrt(var+eps),
oa = beta - mean*sa; after the 1x1x1 conv W_a (+bias b_a), the second BN
folds to sb*z + (sb*b_a + beta_b - mean_b*sb).  Training keeps the XLA
path (native vjp, live batch stats).
"""

import functools
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pfnl_tpu.ops.pallas.common import _prec, _round_up


class BlockParams(NamedTuple):
    sa: jax.Array   # [F]  BN-a folded scale
    oa: jax.Array   # [F]  BN-a folded offset
    wa: jax.Array   # [F, F] 1x1x1 conv
    sb: jax.Array   # [F]  BN-b folded scale
    ob: jax.Array   # [F]  BN-b folded offset (conv-a bias folded in)
    wb: jax.Array   # [3,3,3,F,G]
    bb: jax.Array   # [G]
    mode: str       # "thw" (SAME-T) | "hw" (VALID-T)


def _kernel(x_hbm, sa, oa, wa, sb, ob, wbp, bb, out_hbm,
            xslots, aslots, rmw, x_sems, rmw_sems,
            *, rows, wp, w, h, f, fc, g, fa, loff, in_lo, in_hi,
            out_lo, out_hi, dtype):
    b = pl.program_id(0)
    i = pl.program_id(1)
    row0 = i * rows
    lp = (rows + 2) * wp

    # validity of the a-tile rows/cols (xbuf rows 1..h, cols 1..w hold
    # the image; everything else must stay exactly zero)
    grow = row0 + jax.lax.broadcasted_iota(jnp.int32, (rows + 2, wp, 1), 0)
    gcol = jax.lax.broadcasted_iota(jnp.int32, (rows + 2, wp, 1), 1)
    valid = ((grow >= 1) & (grow <= h) & (gcol >= 1) & (gcol <= w))
    valid2 = valid.reshape(lp, 1)

    planes = list(range(out_lo - 1, out_hi + 1))

    def dma(k):
        return pltpu.make_async_copy(
            x_hbm.at[b, planes[k], pl.ds(row0, rows + 2), :, 0:fc],
            xslots.at[k % 2],
            x_sems.at[k % 2],
        )

    def compute_a(k):
        slot = k % 4
        p = planes[k]
        if p < in_lo or p >= in_hi:
            # pad plane: the reference zero-pads AFTER the pointwise
            # chain, so its a-values are exactly zero
            aslots[slot] = jnp.zeros((lp, f), dtype)
            return
        dma(k).wait()
        xv = xslots[k % 2].astype(jnp.float32)
        t0 = jnp.maximum(xv * sa[0].reshape(1, 1, fc)
                         + oa[0].reshape(1, 1, fc), 0.0)
        t0 = jnp.where(valid, t0, 0.0).astype(dtype).reshape(lp, fc)
        a1 = jax.lax.dot_general(
            t0, wa[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_prec(dtype),
        )
        a1 = jnp.maximum(a1 * sb[0].reshape(1, f) + ob[0].reshape(1, f), 0.0)
        aslots[slot] = jnp.where(valid2, a1, 0.0).astype(dtype)

    def rmw_copy(k, write: bool):
        slot = (k - 1) % 2
        hbm = out_hbm.at[b, planes[k - 1], pl.ds(row0 + 1, rows), :,
                         fa:fa + 128]
        if write:
            return pltpu.make_async_copy(rmw.at[slot], hbm,
                                         rmw_sems.at[slot])
        return pltpu.make_async_copy(hbm, rmw.at[slot], rmw_sems.at[slot])

    def emit(k):
        """conv_b + append for out plane planes[k-1].  The RMW read was
        started before compute_a(k); the write is waited two emits later
        (slot ping-pong), overlapping both with compute."""
        acc = None
        for dt in range(3):
            d = jax.lax.dot_general(
                aslots[(k - 2 + dt) % 4], wbp[dt],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_prec(dtype),
            )
            acc = d if acc is None else acc + d
        y3 = acc.reshape(rows + 2, wp, 9 * g)
        z = None
        for dh in range(3):
            for dw in range(3):
                c0 = (dw * 3 + dh) * g
                part = y3[dh:dh + rows, dw:dw + w, c0:c0 + g]
                z = part if z is None else z + part
        z = z + bb[0].reshape(1, 1, g)
        # mask rows past the image bottom (last tile)
        zrow = jax.lax.broadcasted_iota(jnp.int32, (rows, w, 1), 0)
        z = jnp.where(row0 + 1 + zrow <= h, z, 0.0)
        zfull = jnp.pad(z, ((0, 0), (1, wp - w - 1), (0, 0)))
        z128 = jnp.pad(zfull, ((0, 0), (0, 0), (loff, 128 - loff - g)))

        slot = (k - 1) % 2
        rmw_copy(k, write=False).wait()
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, wp, 128), 2)
        sel = (lane >= loff) & (lane < loff + g)
        rmw[slot] = jnp.where(sel, z128.astype(dtype), rmw[slot])
        rmw_copy(k, write=True).start()

    n = len(planes)
    if planes[0] >= in_lo:
        dma(0).start()
    for k in range(n):
        if k + 1 < n and in_lo <= planes[k + 1] < in_hi:
            dma(k + 1).start()
        if k >= 2:
            if k >= 4:
                rmw_copy(k - 2, write=True).wait()  # free this slot
            rmw_copy(k, write=False).start()
        compute_a(k)
        if k >= 2:
            emit(k)
    # drain the last two appends before the grid step ends
    for k in (n - 2, n - 1):
        if k >= 2:
            rmw_copy(k, write=True).wait()


def _run_block(xbuf, p: BlockParams, *, rows, h, w, in_lo, in_hi,
               out_lo, out_hi):
    nb, tp, hp, wp, c = xbuf.shape
    dtype = xbuf.dtype
    f = p.wa.shape[0]
    g = p.wb.shape[-1]
    fc = _round_up(f, 128)
    fa = (f // 128) * 128
    loff = f - fa

    pad_v = lambda v: jnp.pad(
        v.astype(jnp.float32), (0, fc - f)).reshape(1, fc)
    sa, oa = pad_v(p.sa), pad_v(p.oa)
    sbv = p.sb.astype(jnp.float32).reshape(1, f)
    obv = p.ob.astype(jnp.float32).reshape(1, f)
    wa = jnp.pad(p.wa.astype(dtype), ((0, fc - f), (0, 0)))
    wbp = p.wb.astype(dtype).transpose(0, 3, 2, 1, 4).reshape(3, f, 9 * g)
    bbv = p.bb.astype(jnp.float32).reshape(1, g)

    vec = lambda a: pl.BlockSpec(a.shape, lambda b, i: (0,) * a.ndim)
    return pl.pallas_call(
        functools.partial(
            _kernel, rows=rows, wp=wp, w=w, h=h, f=f, fc=fc, g=g, fa=fa,
            loff=loff, in_lo=in_lo, in_hi=in_hi, out_lo=out_lo,
            out_hi=out_hi, dtype=dtype,
        ),
        grid=(nb, (hp - 2) // rows),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [
            vec(a) for a in (sa, oa, wa, sbv, obv, wbp, bbv)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(xbuf.shape, dtype),
        input_output_aliases={0: 0},
        scratch_shapes=[
            pltpu.VMEM((2, rows + 2, wp, fc), dtype),           # xslots
            pltpu.VMEM((4, (rows + 2) * wp, f), dtype),         # aslots
            pltpu.VMEM((2, rows, wp, 128), dtype),              # rmw
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.default_backend() == "cpu",
    )(xbuf, sa, oa, wa, sbv, obv, wbp, bbv)


def dense_backbone_fused(x64, blocks: List[BlockParams]):
    """x64: conv1 output [B, T, H, W, 64].  Runs every dense block on the
    persistent buffer and returns the final concat features
    [B, T_fin, H, W, C_fin] (T_fin = T - 2 * #hw-blocks)."""
    nb, t, h, w, c0 = x64.shape
    dtype = x64.dtype
    g = blocks[0].wb.shape[-1]
    cfin = c0 + len(blocks) * g
    c = _round_up(cfin, 128)
    rows = 16 if dtype == jnp.bfloat16 else 8
    rows = min(rows, _round_up(h, 2))
    hp = _round_up(h, rows) + 2
    wp = _round_up(w + 2, 8)

    xbuf = jnp.zeros((nb, t + 2, hp, wp, c), dtype)
    xbuf = jax.lax.dynamic_update_slice(xbuf, x64, (0, 1, 1, 1, 0))

    lo, hi = 1, t + 1
    for bp in blocks:
        if bp.mode == "thw":
            out_lo, out_hi = lo, hi
        else:
            out_lo, out_hi = lo + 1, hi - 1
        xbuf = _run_block(xbuf, bp, rows=rows, h=h, w=w, in_lo=lo,
                          in_hi=hi, out_lo=out_lo, out_hi=out_hi)
        lo, hi = out_lo, out_hi

    return xbuf[:, lo:hi, 1:h + 1, 1:w + 1, :cfin]
