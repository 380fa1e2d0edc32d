"""Tap-packed 3x3x3 conv for DUF's dense blocks (reference
model/nets.py:9-150, utils.py:280-288).

Why: the dense-block growth convs are 3x3x3 with only G=16 output
channels.  Lowered natively, every MXU pass uses 16 of 128 lanes
(~10 TFLOP/s measured on v5e, ROADMAP round 2) and the 52-layer
backbone runs at 5.5 fps.  This kernel reshapes the SAME contraction so
the dot's N dimension is 9*G = 144 lanes with ZERO structural-zero
FLOPs:

  * the temporal taps (dt) are folded into the contraction by
    accumulating three dots — one per input t-plane — so no plane is
    read more than once per output frame and no zeros are packed;
  * the spatial taps (dh, dw) move to the OUTPUT columns: the dot
    produces y[m, (dw,dh,g)] = sum_f x[m, f] * W[dt,dh,dw,f,g];
  * dw is reduced in-kernel (three static sublane-shifted slice-adds on
    the VMEM tile);
  * dh is reduced by the caller as three channel-group slices of the
    kernel output shifted along H — a single fused XLA pass — so the
    kernel needs NO row halo and tiles H exactly.

Input t-planes are manually DMA'd from HBM into a 4-slot VMEM ring so
each plane is fetched exactly once per row tile (consecutive output
frames share two of their three planes); the next plane prefetches
while the current frame's dots run.

Layouts: x [B,T,H,W,F] channels-minor; packed weights [3, F, 9G] with
column order (dw, dh, g) so the in-kernel dw-reduction slices contiguous
3G-wide lane groups.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pfnl_tpu.ops.pallas.common import _prec, _round_up


def _kernel(x_hbm, p_ref, out_ref, xslots, sems, *, rows, wp, w, g, t_out,
            t_in):
    b = pl.program_id(0)
    i = pl.program_id(1)

    def dma(p):
        return pltpu.make_async_copy(
            x_hbm.at[b, p, pl.ds(i * rows, rows)], xslots.at[p % 4],
            sems.at[p % 4],
        )

    for p in range(3):
        dma(p).start()
    for t in range(t_out):
        if t + 3 < t_in:
            dma(t + 3).start()
        if t == 0:
            dma(0).wait()
            dma(1).wait()
        dma(t + 2).wait()
        acc = None
        for dt in range(3):
            x2 = xslots[(t + dt) % 4].reshape(rows * wp, xslots.shape[-1])
            d = jax.lax.dot_general(
                x2, p_ref[dt], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_prec(x2.dtype),
            )
            acc = d if acc is None else acc + d
        y3 = acc.reshape(rows, wp, 9 * g)
        wpad = out_ref.shape[3]
        z = (y3[:, 0:wpad, 0:3 * g]
             + y3[:, 1:wpad + 1, 3 * g:6 * g]
             + y3[:, 2:wpad + 2, 6 * g:9 * g])
        out_ref[0, t] = z.astype(out_ref.dtype)


def _pick_rows(wp: int, f: int, esize: int) -> int:
    """Largest row tile whose 4-slot input ring stays under ~6 MB (the
    out-block double buffer, f32 accumulator and weights take the rest)."""
    budget = 6 * 1024 * 1024
    r = budget // (4 * wp * f * esize)
    return max(2, min(16, int(r)))


def _conv3x3x3_tap_fwd_impl(x, wk, pad_t: bool):
    n, t, h, wd, f = x.shape
    g = wk.shape[-1]
    t_in = t + 2 if pad_t else t
    t_out = t if pad_t else t - 2
    esize = jnp.dtype(x.dtype).itemsize
    # sliced t-plane DMAs need the sublane (W) extent 8-aligned and the
    # lane (channel) extent 128-aligned; zero pad rows/channels are inert
    # in the contraction
    wpad = _round_up(wd, 8)
    wp = wpad + 8
    fp = _round_up(f, 128)
    rows = _pick_rows(wp, fp, esize)
    hp = _round_up(h + 2, rows)
    xp = jnp.pad(
        x,
        ((0, 0), (1, 1) if pad_t else (0, 0), (1, hp - h - 1),
         (1, wp - wd - 1), (0, fp - f)),
    )
    # [dt,dh,dw,f,g] -> [dt, f, (dw,dh,g)]
    pk = wk.astype(x.dtype).transpose(0, 3, 2, 1, 4).reshape(3, f, 9 * g)
    pk = jnp.pad(pk, ((0, 0), (0, fp - f), (0, 0)))

    z = pl.pallas_call(
        functools.partial(_kernel, rows=rows, wp=wp, w=wd, g=g, t_out=t_out,
                          t_in=t_in),
        grid=(n, hp // rows),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(pk.shape, lambda b, i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t_out, rows, wpad, 3 * g),
                               lambda b, i: (b, 0, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, t_out, hp, wpad, 3 * g), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((4, rows, wp, fp), x.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=jax.default_backend() == "cpu",
    )(xp, pk)

    # dh-reduction: out[h] = sum_dh z[h + dh, dh-group] (z row r holds the
    # products of padded-grid input row r, i.e. original row r-1)
    out = (z[:, :, 0:h, :, 0:g]
           + z[:, :, 1:h + 1, :, g:2 * g]
           + z[:, :, 2:h + 2, :, 2 * g:3 * g])
    return out[:, :, :, :wd, :]


def _conv3x3x3_xla(x, wk, pad_t: bool):
    """XLA oracle: the reference lowering (duf.py Conv3D without bias)."""
    pads = ((1, 1), (1, 1), (1, 1)) if pad_t else ((0, 0), (1, 1), (1, 1))
    return jax.lax.conv_general_dilated(
        x, wk.astype(x.dtype), (1, 1, 1), pads,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def _make_tap(pad_t: bool):
    @jax.custom_vjp
    def tap(x, wk):
        return _conv3x3x3_tap_fwd_impl(x, wk, pad_t)

    def fwd(x, wk):
        return _conv3x3x3_tap_fwd_impl(x, wk, pad_t), (x, wk)

    def bwd(res, gout):
        # training uses the XLA path; this recompute-vjp keeps the op
        # differentiable if someone does backprop through impl='pallas'
        x, wk = res
        _, vjp = jax.vjp(lambda x_, w_: _conv3x3x3_xla(x_, w_, pad_t), x, wk)
        return vjp(gout)

    tap.defvjp(fwd, bwd)
    return tap


_TAP = {True: _make_tap(True), False: _make_tap(False)}


def conv3x3x3_tap(x, wk, pad_t: bool):
    """3x3x3 conv, SAME in H/W, SAME (pad_t=True) or VALID in T.
    x [B,T,H,W,F], wk [3,3,3,F,G] -> [B,T_out,H,W,G] (no bias)."""
    return _TAP[bool(pad_t)](x, wk)
