"""Fused DUF dense-block chain: the whole backbone loop
(BN-relu-1x1x1-BN-relu-3x3x3-concat, reference model/nets.py:9-150) as
one Pallas kernel per block over a persistent lane-aligned buffer.

Why: with per-op lowering the XLA glue dominates the 52-layer backbone —
measured per 720p frame (v5e, bf16): channel concats 40 ms, pads 19 ms,
BN/1x1x1-conv fusions 108 ms, vs 32 ms of actual 3x3x3 conv kernels.
Every op pays relayout/copy costs because the growing channel count
(64+16r) is never lane-aligned.  This kernel removes ALL of it:

  * one zero-initialized HBM buffer `xbuf` [B, T+2, C/128, Hp, Wp, 128]
    holds the growing concat lane-GROUP-major with T/H/W zero padding
    built in — every DMA (x reads of the first Fc lanes, the 128-lane
    RMW append) is a contiguous block at full bandwidth;
  * per block, each input t-plane is DMA'd once per row tile, the
    pointwise chain (BN-a, relu, 1x1x1 conv, BN-b folded with the conv
    bias, relu) runs in VMEM, and the 3x3x3 growth conv is ONE
    tap-fused [lp,F]x[F,27G] dot per a-plane (dt-major slices scattered
    into a 3-slot f32 accumulator ring; spatial taps reduced in-kernel
    via the 1-row halo);
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


def _kernel(x_hbm, sa, oa, wa, sb, ob, wcat, bb, out_hbm,
            xslots, aslot, rmw, zacc, x_sems, rmw_sems,
            *, rows, wp, w, h, f, fc, g, gi, loff, in_lo, in_hi,
            out_lo, out_hi, dtype):
    b = pl.program_id(0)
    i = pl.program_id(1)
    row0 = i * rows
    lp = (rows + 2) * wp
    ng = fc // 128

    # validity of the a-tile rows/cols (xbuf rows 1..h, cols 1..w hold
    # the image; everything else must stay exactly zero)
    grow = row0 + jax.lax.broadcasted_iota(jnp.int32, (rows + 2, wp, 1), 0)
    gcol = jax.lax.broadcasted_iota(jnp.int32, (rows + 2, wp, 1), 1)
    valid = ((grow >= 1) & (grow <= h) & (gcol >= 1) & (gcol <= w))
    valid2 = valid.reshape(lp, 1)

    planes = list(range(out_lo - 1, out_hi + 1))

    def dma(k):
        # group-major xbuf: the first ng 128-lane group planes are
        # CONTIGUOUS blocks — full-bandwidth DMA (a lane slice of a
        # wide minor dim would run at 128/C efficiency)
        return pltpu.make_async_copy(
            x_hbm.at[b, planes[k], pl.ds(0, ng), pl.ds(row0, rows + 2), :, :],
            xslots.at[k % 3],
            x_sems.at[k % 3],
        )

    def compute_a(k):
        # single a-slot: the tap-fused scatter consumes each a-plane
        # immediately (no 3-plane window of live a's anymore).  Pad
        # planes (known at trace time) are handled in scatter_p.
        if planes[k] < in_lo or planes[k] >= in_hi:
            return
        dma(k).wait()
        a1 = None
        for gg in range(ng):
            xv = xslots[k % 3, gg].astype(jnp.float32)
            t0 = jnp.maximum(xv * sa[gg].reshape(1, 1, 128)
                             + oa[gg].reshape(1, 1, 128), 0.0)
            # no per-group validity mask: invalid pixels (buffer zeros)
            # yield the CONSTANT relu(oa).wa per channel, and the final
            # valid2 mask zeroes those rows of a1 anyway
            d = jax.lax.dot_general(
                t0.astype(dtype).reshape(lp, 128), wa[gg],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_prec(dtype),
            )
            a1 = d if a1 is None else a1 + d
        a1 = jnp.maximum(a1 * sb[0].reshape(1, f) + ob[0].reshape(1, f), 0.0)
        aslot[...] = jnp.where(valid2, a1, 0.0).astype(dtype)

    def rmw_copy(j, write: bool):
        """RMW transfer for OUT plane index j (emitted at iteration
        j+1); slot j%3.  Planes touch disjoint HBM regions, so reads
        can be issued arbitrarily early."""
        slot = j % 3
        hbm = out_hbm.at[b, planes[j], gi, pl.ds(row0 + 1, rows), :, :]
        if write:
            return pltpu.make_async_copy(rmw.at[slot], hbm,
                                         rmw_sems.at[slot])
        return pltpu.make_async_copy(hbm, rmw.at[slot], rmw_sems.at[slot])

    def scatter_p(k):
        """Tap-fused growth conv for a-plane k: ONE [lp,f]x[f,27g] dot
        (N=27g=432 lanes vs 3 dots of 9g=144 — 144 pads to 2 lane
        groups at 56% MXU efficiency, 432 to 4 at 84%), whose dt-major
        slices are scattered into the 3-slot accumulator ring of the
        output planes k+1 (first touch), k, k-1 (last touch):
        plane p = sum_dt a[p-1+dt] . wb[dt]  <=>  a[q] contributes its
        dt=0/1/2 slice to planes q+1, q, q-1.  Temporal pad planes
        (reference zero-pad-after-activation) contribute exact zeros:
        initialize the k+1 accumulator and skip the dot entirely."""
        if planes[k] < in_lo or planes[k] >= in_hi:
            zacc[(k + 1) % 3] = jnp.zeros((lp, 9 * g), jnp.float32)
            return
        p9 = jax.lax.dot_general(
            aslot[...], wcat[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_prec(dtype),
        )
        zacc[(k + 1) % 3] = p9[:, : 9 * g]
        zacc[k % 3] += p9[:, 9 * g: 18 * g]
        if k >= 2:
            zacc[(k - 1) % 3] += p9[:, 18 * g:]

    def emit(k):
        """Finalize out plane planes[k-1] from its accumulator.  The RMW
        read was started before compute_a(k); the write is waited two
        emits later (slot ping-pong), overlapping both with compute."""
        y3 = zacc[(k - 1) % 3].reshape(rows + 2, wp, 9 * g)
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

        slot = (k - 1) % 3
        rmw_copy(k - 1, write=False).wait()
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, wp, 128), 2)
        sel = (lane >= loff) & (lane < loff + g)
        rmw[slot] = jnp.where(sel, z128.astype(dtype), rmw[slot])
        rmw_copy(k - 1, write=True).start()

    # Pipeline (measured: the per-iteration DMA wait chain, not dots or
    # bandwidth, dominated early blocks): x reads issued TWO planes
    # ahead, RMW reads one iteration before their emit, 3-slot rings.
    n = len(planes)
    for k in (0, 1):
        if k < n and in_lo <= planes[k] < in_hi:
            dma(k).start()
    for k in range(n):
        if k + 2 < n and in_lo <= planes[k + 2] < in_hi:
            dma(k + 2).start()
        if 1 <= k <= n - 2:
            if k - 3 >= 1:
                # slot k%3 was last used by plane k-3's write (started
                # at iteration k-2); it must land before the new read
                rmw_copy(k - 3, write=True).wait()
            rmw_copy(k, write=False).start()        # for emit at k+1
        compute_a(k)
        scatter_p(k)
        if k >= 2:
            emit(k)
    # drain every write not already waited in-loop (in-loop waits cover
    # planes 1..n-5; started writes cover 1..n-2)
    for j in range(max(1, n - 4), n - 1):
        rmw_copy(j, write=True).wait()


def _run_block(xbuf, p: BlockParams, *, rows, h, w, in_lo, in_hi,
               out_lo, out_hi):
    nb, _, _, hp, wp, _ = xbuf.shape
    dtype = xbuf.dtype
    f = p.wa.shape[0]
    g = p.wb.shape[-1]
    fc = _round_up(f, 128)
    ng = fc // 128
    gi = f // 128           # 128-lane group receiving the appended G
    loff = f - gi * 128

    pad_v = lambda v: jnp.pad(
        v.astype(jnp.float32), (0, fc - f)).reshape(ng, 128)
    sa, oa = pad_v(p.sa), pad_v(p.oa)
    sbv = p.sb.astype(jnp.float32).reshape(1, f)
    obv = p.ob.astype(jnp.float32).reshape(1, f)
    wa = jnp.pad(p.wa.astype(dtype), ((0, fc - f), (0, 0))).reshape(
        ng, 128, f)
    # [dt, dh, dw, F, G] -> [F, dt, dw, dh, G] -> [f, 27g], dt major and
    # (dw*3+dh)*g within each 9g slice (the layout emit's slicing expects)
    wcat = p.wb.astype(dtype).transpose(3, 0, 2, 1, 4).reshape(f, 27 * g)
    bbv = p.bb.astype(jnp.float32).reshape(1, g)

    vec = lambda a: pl.BlockSpec(a.shape, lambda b, i: (0,) * a.ndim)
    return pl.pallas_call(
        functools.partial(
            _kernel, rows=rows, wp=wp, w=w, h=h, f=f, fc=fc, g=g, gi=gi,
            loff=loff, in_lo=in_lo, in_hi=in_hi, out_lo=out_lo,
            out_hi=out_hi, dtype=dtype,
        ),
        grid=(nb, (hp - 2) // rows),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [
            vec(a) for a in (sa, oa, wa, sbv, obv, wcat, bbv)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(xbuf.shape, dtype),
        input_output_aliases={0: 0},
        scratch_shapes=[
            pltpu.VMEM((3, ng, rows + 2, wp, 128), dtype),      # xslots
            pltpu.VMEM(((rows + 2) * wp, f), dtype),            # aslot
            pltpu.VMEM((3, rows, wp, 128), dtype),              # rmw
            pltpu.VMEM((3, (rows + 2) * wp, 9 * g), jnp.float32),  # zacc
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.default_backend() == "cpu",
    )(xbuf, sa, oa, wa, sbv, obv, wcat, bbv)


def dense_backbone_fused(x64, blocks: List[BlockParams]):
    """x64: conv1 output [B, T, H, W, 64].  Runs every dense block on the
    persistent buffer and returns the final concat features
    [B, T_fin, H, W, C_fin] (T_fin = T - 2 * #hw-blocks)."""
    nb, t, h, w, c0 = x64.shape
    dtype = x64.dtype
    g = blocks[0].wb.shape[-1]
    cfin = c0 + len(blocks) * g
    c = _round_up(cfin, 128)
    ngb = c // 128
    rows = 24 if dtype == jnp.bfloat16 else 8
    rows = min(rows, _round_up(h, 2))
    hp = _round_up(h, rows) + 2
    wp = _round_up(w + 2, 8)

    # lane-GROUP-major buffer [B, T, C/128, H, W, 128]: every kernel DMA
    # (x reads of the first fc lanes, the 128-lane RMW append) is then a
    # CONTIGUOUS block.  With a flat C-minor buffer the RMW append
    # touches 128 of C lanes -> 128/C DMA efficiency, which made the
    # whole backbone append-bandwidth-bound.
    xbuf = jnp.zeros((nb, t + 2, ngb, hp, wp, 128), dtype)
    x0 = jnp.pad(x64, ((0, 0),) * 4 + ((0, 128 - c0),))[:, :, None]
    xbuf = jax.lax.dynamic_update_slice(xbuf, x0, (0, 1, 0, 1, 1, 0))

    lo, hi = 1, t + 1
    for bp in blocks:
        if bp.mode == "thw":
            out_lo, out_hi = lo, hi
        else:
            out_lo, out_hi = lo + 1, hi - 1
        xbuf = _run_block(xbuf, bp, rows=rows, h=h, w=w, in_lo=lo,
                          in_hi=hi, out_lo=out_lo, out_hi=out_hi)
        lo, hi = out_lo, out_hi

    out = xbuf[:, lo:hi, :, 1:h + 1, 1:w + 1, :]
    out = out.transpose(0, 1, 3, 4, 2, 5).reshape(
        nb, hi - lo, h, w, ngb * 128)
    return out[..., :cfin]
