"""Fused Progressive-Fusion Residual Block (PFRB) TPU kernel.

One PFRB (reference model/pfnl.py:65-71, as refactored in
pfnl_tpu.models.pfnl) is, per sample:

    i1_t  = lrelu(conv3x3(feat_t, W1) + b1)            t = 0..T-1 (shared W1)
    base  = lrelu(sum_t i1_t @ Wfuse_t + bfuse)        1x1 fusion over frames
    i2_t  = lrelu(conv3x3(i1_t, W2f) + conv3x3(base, W2b) + b2)
    out_t = feat_t + i2_t

Executed in XLA this costs ~8.4 ms/block at batch 4 (three HBM round trips
of a 206 MB activation + 64-channel convs at ~26 TFLOP/s).  This kernel
keeps one whole block in VMEM per (batch, row-tile) program.

The conv strategy (measured at ~88 TFLOP/s on v5e vs 26 for the XLA conv,
scripts/pallas_dot_bench.py):

  * activations live in a FLATTENED 2-D layout [(rows)*C2, C], where C2
    (the padded grid width) is a multiple of the 16-sublane tile, so
    row shifts are tile-aligned slices;
  * the 3 dy taps are concatenated along the channel axis (K = 3C = 192)
    — legal in Mosaic because the dy slices share lane/sublane offsets;
  * one MXU dot per dx, then the 3 dx-shifted outputs are summed as
    flat offset slices (an off-by-dx flat shift never crosses into a
    neighbouring row's valid columns because the grid is 2 cols wider
    than the image on each side);
  * each conv shifts the logical grid by (+1,+1): after two convs the
    output's flat column c equals image column c.

Data movement: inputs/outputs are HBM (`memory_space=ANY`) and moved with
explicit async DMAs; the model keeps the activation in the kernel's
zero-halo padded layout across all 20 blocks (`pfrb_chain`) so padding is
paid once.  Boundary semantics are exact SAME-conv: the padded halo rows/
cols are zero, and the i1/base halo ring is re-zeroed where it crosses
the image boundary (the reference zero-pads i1/base for conv2, it does
not extrapolate them).

Backward pass: custom_vjp whose bwd re-traces the XLA reference
implementation — training crops are tiny, so the XLA gradient path costs
little while inference gets the kernel.

STATUS (v5e, batch 4, 180x320): 10.1 ms/block vs 12.9 ms for the
standalone XLA block (8.4 ms when XLA fuses blocks in-model) — parity,
not yet a win.  Per-program accounting: ~20 us MXU (the conv dots do run
at the microbenchmarked ~88 TFLOP/s), ~15 us VPU (lane-compaction copies,
ring masks, shifts), ~12 us serial DMA (the channel dim must be
lane-padded 64->128 for DMA-able HBM slices, doubling traffic).  The
known path forward (next round): pack 2 spatial columns per 128-lane
group to eliminate the padding (halves DMA + compaction), and move to a
(b, tile, frame) grid with revisiting-output accumulation for the fusion
so the auto-pipeline overlaps DMA across programs.  Until the kernel
clearly beats XLA, models default to the XLA path (pfrb_impl="auto").
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lrelu(x, alpha=0.2):
    return jnp.maximum(x, alpha * x)


def _prec(dtype):
    """f32 operands need an explicit HIGHEST or Mosaic lowers the dot to a
    single bf16 pass (~1e-3 rel error; measured)."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


def _pack_dy(w: jax.Array) -> jax.Array:
    """[3,3,C,F] conv kernel -> [3 (dx), 3C (dy-concat), F]."""
    return jnp.stack(
        [jnp.concatenate([w[0, dx], w[1, dx], w[2, dx]], axis=0) for dx in range(3)]
    )


def _conv2d_flat(x2, wd, rows_out, c2):
    """x2: [(rows_out+2)*C2, C] flattened input; wd: [3, 3C, F].
    Returns [rows_out*C2, F] f32 where flat (r, c) = conv output centered
    at input grid (r+1, c+1)."""
    L = rows_out * c2
    t3 = jnp.concatenate([x2[0:L], x2[c2 : c2 + L], x2[2 * c2 : 2 * c2 + L]], axis=-1)
    lv = L - 2
    acc = None
    for dx in range(3):
        o = jax.lax.dot_general(
            t3, wd[dx], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_prec(t3.dtype)
        )
        part = o[dx : dx + lv]
        acc = part if acc is None else acc + part
    return jnp.pad(acc, ((0, 2), (0, 0)))


def _pack_dydx(w: jax.Array) -> jax.Array:
    """[3,3,C,F] conv kernel -> [3C, 3F]: rows are the dy-concat of the
    input channels, column group dx holds that dx's kernel.  Enables the
    whole 3x3 conv as ONE MXU dot (N=3F) — measured 114 vs 73 TFLOP/s for
    the 3-dot N=F scheme (scripts/conv_variants_bench.py)."""
    return jnp.concatenate(
        [jnp.concatenate([w[0, dx], w[1, dx], w[2, dx]], 0) for dx in range(3)],
        axis=1,
    )


def _conv2d_flat_wcat(x2, wdd, rows_out, c2):
    """Same contract as _conv2d_flat but wdd: [3C, 3F] (from _pack_dydx)
    and ONE dot; the dx-shifted adds are sublane rotates (pltpu.roll).

    CAVEAT: the last 2 flat rows of the result hold rotated-in garbage
    (instead of the zeros _conv2d_flat pads).  Those flat positions are
    the final 2 columns of the tile's last row, which lie outside every
    image/ring mask (c2 >= w + 4), so all callers mask them anyway."""
    L = rows_out * c2
    t3 = jnp.concatenate([x2[0:L], x2[c2 : c2 + L], x2[2 * c2 : 2 * c2 + L]], axis=-1)
    o = jax.lax.dot_general(
        t3, wdd, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_prec(t3.dtype)
    )
    f = wdd.shape[-1] // 3
    return (
        o[:, 0:f]
        + pltpu.roll(o[:, f : 2 * f], L - 1, 0)
        + pltpu.roll(o[:, 2 * f : 3 * f], L - 2, 0)
    )


def _kernel(
    feat_hbm, wd1, b1, wfuse, bfuse, wd2f, wd2b, b2, out_hbm,
    xbuf, i1buf, obuf, zbuf, in_sems, out_sems, z_sems,
    *, rows, c2, h, w, n_tiles, t_frames, c,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    row0 = i * rows
    cl = xbuf.shape[-1]  # lane-padded channels; c = logical channels

    # ---- stage all input DMAs (rows+4 incl. zero halos; always in-bounds
    # because the carried layout has 2 zero rows top/bottom) ----
    def in_dma(t):
        return pltpu.make_async_copy(
            feat_hbm.at[b, t, pl.ds(row0, rows + 4)], xbuf.at[t], in_sems.at[t]
        )

    for t in range(t_frames):
        in_dma(t).start()

    # validity masks in flat coordinates
    l1 = (rows + 2) * c2
    flat1 = jax.lax.broadcasted_iota(jnp.int32, (l1, 1), 0)
    r1 = flat1 // c2  # i1 row within tile; global image row = row0 - 1 + r1
    col1 = flat1 - r1 * c2  # i1 grid col; image col = col1 - 1
    g1 = row0 - 1 + r1
    ring_valid = (col1 >= 1) & (col1 <= w) & (g1 >= 0) & (g1 < h)

    l2 = rows * c2
    flat2 = jax.lax.broadcasted_iota(jnp.int32, (l2, 1), 0)
    r2 = flat2 // c2
    col2 = flat2 - r2 * c2  # = image col
    g2 = row0 + r2
    out_valid = (col2 < w) & (g2 < h)

    # ---- pass 1: conv1 per frame + fusion accumulation ----
    base_acc = None
    for t in range(t_frames):
        in_dma(t).wait()
        x2 = xbuf[t].reshape((rows + 4) * c2, cl)[:, :c]
        i1_t = _conv2d_flat(x2, wd1[:], rows + 2, c2) + b1[:].astype(jnp.float32)
        i1_t = jnp.where(ring_valid, _lrelu(i1_t), 0.0).astype(xbuf.dtype)
        i1buf[t] = i1_t.reshape(rows + 2, c2, c)
        contrib = jax.lax.dot_general(
            i1_t, wfuse[t], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        base_acc = contrib if base_acc is None else base_acc + contrib
    base = jnp.where(
        ring_valid, _lrelu(base_acc + bfuse[:].astype(jnp.float32)), 0.0
    ).astype(xbuf.dtype)

    # ---- conv2 base half (once per tile) ----
    base_part = _conv2d_flat(base, wd2b[:], rows, c2)  # [rows*C2, C] f32

    # ---- pass 2: conv2 frame half + residual + output DMA ----
    def out_dma(slot, t):
        return pltpu.make_async_copy(
            obuf.at[slot], out_hbm.at[b, t, pl.ds(row0 + 2, rows)], out_sems.at[slot]
        )

    for t in range(t_frames):
        i1_flat = i1buf[t].reshape(l1, c)
        frame_part = _conv2d_flat(i1_flat, wd2f[:], rows, c2)
        i2 = _lrelu(frame_part + base_part + b2[:].astype(jnp.float32))
        # residual: xbuf flat index r*C2 + (imgcol + 2) + 2*C2 == out flat
        # (r, imgcol) shifted by 2*C2 + 2; slice rows first, compact lanes
        # second (keeps the relayout copy small)
        center = xbuf[t].reshape((rows + 4) * c2, cl)[
            2 * c2 + 2 : 2 * c2 + 2 + l2, :c
        ]
        val = jnp.where(
            out_valid, center.astype(jnp.float32) + i2, 0.0
        ).astype(obuf.dtype)
        # shift +2 so flat col c maps back to padded grid col c+2
        val = jnp.pad(val, ((2, 0), (0, 0)))[0:l2]
        slot = t % 2
        if t >= 2:
            out_dma(slot, t - 2).wait()
        # store into the logical-channel lane slice; the padding lanes keep
        # stale bytes that no consumer ever reads
        obuf[slot, :, :, :c] = val.reshape(rows, c2, c)
        out_dma(slot, t).start()

    for t in range(max(0, t_frames - 2), t_frames):
        out_dma(t % 2, t).wait()

    # ---- zero halo strips of the output (carried layout invariant) ----
    @pl.when((i == 0) | (i == n_tiles - 1))
    def _zero_halos():
        zbuf[:] = jnp.zeros_like(zbuf)
        for t in range(t_frames):
            @pl.when(i == 0)
            def _top():
                cp = pltpu.make_async_copy(
                    zbuf.at[:], out_hbm.at[b, t, pl.ds(0, 2)], z_sems.at[0]
                )
                cp.start()
                cp.wait()
            @pl.when(i == n_tiles - 1)
            def _bot():
                cp = pltpu.make_async_copy(
                    zbuf.at[:],
                    out_hbm.at[b, t, pl.ds(n_tiles * rows + 2, 2)],
                    z_sems.at[1],
                )
                cp.start()
                cp.wait()


def _round_up(x, m):
    return -(-x // m) * m


def pad_to_kernel_layout(feat, rows=4, sublane=16, lane=128):
    """[B,T,H,W,C] -> zero-halo padded [B,T,Hp+4,C2,CL] kernel layout.

    The channel dim is padded to the 128-lane tile so HBM<->VMEM DMAs are
    tile-aligned (Mosaic cannot DMA-slice a 64-lane minor dim)."""
    n, t, h, w, c = feat.shape
    hp = _round_up(h, rows)
    c2 = _round_up(w + 4, sublane)
    cl = _round_up(c, lane)
    return jnp.pad(
        feat,
        ((0, 0), (0, 0), (2, hp - h + 2), (2, c2 - w - 2), (0, cl - c)),
    )


def unpad_from_kernel_layout(padded, h, w, c=64):
    return padded[:, :, 2 : 2 + h, 2 : 2 + w, :c]


def _pfrb_padded_pallas(padded, params, h, w, rows):
    """One PFRB on the padded layout. params = (w1,b1,wfuse,bfuse,w2f,w2b,b2)."""
    w1, b1, wfuse, bfuse, w2f, w2b, b2 = params
    n, t, hp4, c2, cl = padded.shape
    c = w1.shape[2]  # logical channels (cl is lane-padded)
    n_tiles = (hp4 - 4) // rows
    dtype = padded.dtype
    wd1 = _pack_dy(w1.astype(dtype))
    wd2f = _pack_dy(w2f.astype(dtype))
    wd2b = _pack_dy(w2b.astype(dtype))

    kernel = functools.partial(
        _kernel, rows=rows, c2=c2, h=h, w=w, n_tiles=n_tiles, t_frames=t, c=c
    )
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    vmem = lambda shape: pl.BlockSpec(shape, lambda b, i: tuple(0 for _ in shape))

    operands = (
        padded,
        wd1,
        b1.reshape(1, -1).astype(jnp.float32),
        wfuse.astype(dtype),
        bfuse.reshape(1, -1).astype(jnp.float32),
        wd2f,
        wd2b,
        b2.reshape(1, -1).astype(jnp.float32),
    )
    return pl.pallas_call(
        kernel,
        grid=(n, n_tiles),
        in_specs=[any_spec] + [vmem(op.shape) for op in operands[1:]],
        out_specs=any_spec,
        out_shape=jax.ShapeDtypeStruct(padded.shape, dtype),
        scratch_shapes=[
            pltpu.VMEM((t, rows + 4, c2, cl), dtype),  # xbuf (lane-padded)
            pltpu.VMEM((t, rows + 2, c2, c), dtype),   # i1buf
            pltpu.VMEM((2, rows, c2, cl), dtype),      # obuf (lane-padded)
            pltpu.VMEM((2, c2, cl), dtype),            # zbuf
            pltpu.SemaphoreType.DMA((t,)),             # in_sems
            pltpu.SemaphoreType.DMA((2,)),             # out_sems
            pltpu.SemaphoreType.DMA((2,)),             # z_sems
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=jax.default_backend() == "cpu",
    )(*operands)


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


def pfrb_chain_xla(feat, params_list):
    """N PFRBs in XLA.  (A frame-major variant that avoids the fusion
    einsum's internal transpose was measured SLOWER on v5e — XLA's loop of
    T small GEMMs lost more than the transpose cost — so the layout is
    kept batch-major.)"""
    for p in params_list:
        feat = pfrb_block_xla(feat, *p)
    return feat


@jax.custom_vjp
def pfrb_chain(feat, params_list):
    """N fused PFRBs: Pallas forward (padding paid once), XLA gradient."""
    n, t, h, w, c = feat.shape
    rows = 4
    padded = pad_to_kernel_layout(feat, rows=rows)
    for p in params_list:
        padded = _pfrb_padded_pallas(padded, p, h, w, rows)
    return unpad_from_kernel_layout(padded, h, w, c)


def _chain_fwd(feat, params_list):
    return pfrb_chain(feat, params_list), (feat, params_list)


def _chain_bwd(res, g):
    feat, params_list = res
    _, vjp = jax.vjp(pfrb_chain_xla, feat, params_list)
    return vjp(g)


pfrb_chain.defvjp(_chain_fwd, _chain_bwd)


def pfrb_block(feat, w1, b1, wfuse, bfuse, w2f, w2b, b2):
    """Single fused PFRB (thin wrapper over pfrb_chain)."""
    return pfrb_chain(feat, [(w1, b1, wfuse, bfuse, w2f, w2b, b2)])
