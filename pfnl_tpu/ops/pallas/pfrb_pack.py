"""Fused PFRB as two Pallas kernels on a column-PAIR packed layout.

Supersedes the earlier 64-lane two-kernel layout (removed; see git
history).  Measured on v5e: HBM arrays
whose minor dim is 64 are physically lane-padded to 128, so every DMA of
the [.., C2, 64] activation moved 2x its logical bytes (262 vs 460+ GB/s
logical copy rate, scripts/conv_variants_bench.py experiments).  Here two
adjacent image columns share one 128-lane group:

    packed[b, t, r, p, :] = (feat[b, t, r, 2p, :64] | feat[b, t, r, 2p+1, :64])

so all streams run at full HBM rate.  The 3x3 conv becomes ONE MXU dot
per frame on the flattened pair grid plus ONE sublane rotate:

    t3p[q]  = (x2p[q] | x2p[q+c2p] | x2p[q+2*c2p])          # dy-concat, K=384
    O       = t3p @ Wpk                                      # [Lp, 256]
    out[q]  = O[q, 0:128] + O[q+1, 128:256]                  # roll(Lp-1)

Wpk [384, 256] (from _pack_pair) carries each input pair's contribution
to its own output pair ("self" half) and to the previous output pair
("next" half); 1/4 of it is structurally zero (the packing costs ~1.33x
the dense conv FLOPs) but N=256 runs ~2x the N=64 MXU issue rate, a
large net win.  Conv convention: output flat (r, c)
is the conv centered at input grid (r+1, c+1).

Kernel A computes i1 per frame and accumulates the 1x1 temporal fusion
into `base` across frame groups (revisited output block); the fusion is
one K=tb*128 dot against block-diagonal-packed weights.  Kernel B adds
the residual: out = feat + lrelu(conv(i1, W2f) + conv(base, W2b) + b2).
Reference math: /root/reference/model/pfnl.py:65-71.

Carried activation layout: [B, T, Hp, C2/2, 128] with the image at rows
[0, H), columns [2, W+2) (pairs [1, (W+2)/2)); zeros elsewhere.
C2 % 32 == 0 so pair-grid dy slices stay sublane-tile aligned.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pfnl_tpu.ops.pallas.common import _lrelu, _prec, _round_up
from pfnl_tpu.ops.pallas.pfrb_xla import pfrb_chain_xla


def _pack_pair(w: jax.Array) -> jax.Array:
    """[3,3,C,F] conv kernel -> [6C, 4F] pair-packed dot matrix.

    Row layout (dy major, column parity minor) matches the t3p lane
    concat; column layout: [self_even F | self_odd F | next_even F |
    next_odd F]."""
    z = jnp.zeros_like(w[0, 0])
    rows = []
    for dy in range(3):
        # even input column of the pair
        rows.append(jnp.concatenate([w[dy, 0], z, w[dy, 2], w[dy, 1]], axis=1))
        # odd input column
        rows.append(jnp.concatenate([w[dy, 1], w[dy, 0], z, w[dy, 2]], axis=1))
    return jnp.concatenate(rows, axis=0)


def _pack_fuse(wfuse: jax.Array, n_tsteps: int, tb: int) -> jax.Array:
    """[T, C, C] fusion weights -> [n_tsteps, tb*2C, 2C] with each frame's
    64x64 matrix duplicated block-diagonally over the two pair columns."""
    t, c, _ = wfuse.shape
    z = jnp.zeros_like(wfuse[0])
    blocks = [
        jnp.concatenate(
            [jnp.concatenate([wfuse[i], z], 1), jnp.concatenate([z, wfuse[i]], 1)],
            axis=0,
        )
        for i in range(t)
    ]  # each [2C, 2C]
    return jnp.stack(blocks).reshape(n_tsteps, tb * 2 * c, 2 * c)


def _conv2d_pack(x2p, wpk, rows_out, c2p):
    """x2p: [(rows_out+2)*c2p, 128] flattened packed input; wpk [384, 256].
    Returns [rows_out*c2p, 128] f32.  The roll wraps garbage into the last
    flat pair (the tile's last row's final pair) — outside every mask."""
    lp = rows_out * c2p
    t3 = jnp.concatenate(
        [x2p[0:lp], x2p[c2p : c2p + lp], x2p[2 * c2p : 2 * c2p + lp]], axis=-1
    )
    o = jax.lax.dot_general(
        t3, wpk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_prec(t3.dtype)
    )
    return o[:, 0:128] + pltpu.roll(o[:, 128:256], lp - 1, 0)


def _masks_pack(i, rows, c2p, h, w):
    """(ring_valid, out_valid): [rows*c2p, 128] bool masks in the packed
    grid.  ring: exact image support of the i1 grid (col c <-> image col
    c-1); out: image support of the output grid (col c == image col c)."""
    lp = rows * c2p
    q = jax.lax.broadcasted_iota(jnp.int32, (lp, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (lp, 128), 1)
    r = q // c2p
    col = 2 * (q - r * c2p) + lane // 64
    g = i * rows + r
    row_ok = g < h
    ring_valid = (col >= 1) & (col <= w) & row_ok
    out_valid = (col < w) & row_ok
    return ring_valid, out_valid


def _row_valid_pack(i, rows, c2p, h):
    rr = jax.lax.broadcasted_iota(jnp.int32, (rows + 2, 1, 1), 0)
    grow = i * rows - 1 + rr
    return (grow >= 0) & (grow < h)


def _assemble(prev, cur, nxt, row_valid):
    x = jnp.concatenate([prev[-1:], cur, nxt[:1]], axis=0)
    return jnp.where(row_valid, x, 0)


def _kernel_a(prev_ref, cur_ref, next_ref, wpk1, b1, wfuse, bfuse,
              i1_ref, base_ref, *, rows, c2p, h, w, n_tsteps, tb):
    i = pl.program_id(1)
    ts = pl.program_id(2)
    cl = cur_ref.shape[-1]
    ring_valid, _ = _masks_pack(i, rows, c2p, h, w)
    row_valid = _row_valid_pack(i, rows, c2p, h)
    lp = rows * c2p

    i1s = []
    for j in range(tb):
        x = _assemble(prev_ref[0, j], cur_ref[0, j], next_ref[0, j], row_valid)
        x2p = x.reshape((rows + 2) * c2p, cl)
        i1 = _conv2d_pack(x2p, wpk1[:], rows, c2p) + b1[:].astype(jnp.float32)
        i1 = jnp.where(ring_valid, _lrelu(i1), 0.0).astype(i1_ref.dtype)
        i1_ref[0, j] = i1.reshape(rows, c2p, cl)
        i1s.append(i1)

    cat = jnp.concatenate(i1s, axis=-1)
    contrib = jax.lax.dot_general(
        cat, wfuse[ts], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_prec(cat.dtype),
    )

    @pl.when(ts == 0)
    def _init():
        base_ref[0] = contrib.reshape(rows, c2p, cl).astype(base_ref.dtype)

    @pl.when(ts > 0)
    def _acc():
        base_ref[0] = (
            base_ref[0].astype(jnp.float32) + contrib.reshape(rows, c2p, cl)
        ).astype(base_ref.dtype)

    @pl.when(ts == n_tsteps - 1)
    def _finalize():
        acc = base_ref[0].astype(jnp.float32).reshape(lp, cl)
        acc = acc + bfuse[:].astype(jnp.float32)
        acc = jnp.where(ring_valid, _lrelu(acc), 0.0)
        base_ref[0] = acc.reshape(rows, c2p, cl).astype(base_ref.dtype)


def _kernel_b(i1p_ref, i1c_ref, i1n_ref, basep_ref, basec_ref, basen_ref,
              feat_ref, wpk2f, wpk2b, b2, out_ref, bpart_ref,
              *, rows, c2p, h, w, n_tsteps, tb):
    i = pl.program_id(1)
    ts = pl.program_id(2)
    cl = i1c_ref.shape[-1]
    _, out_valid = _masks_pack(i, rows, c2p, h, w)
    row_valid = _row_valid_pack(i, rows, c2p, h)
    lp = rows * c2p

    @pl.when(ts == 0)
    def _base_once():
        basex = _assemble(basep_ref[0], basec_ref[0], basen_ref[0], row_valid)
        bp = _conv2d_pack(basex.reshape((rows + 2) * c2p, cl), wpk2b[:], rows, c2p)
        bpart_ref[:] = bp

    for j in range(tb):
        i1x = _assemble(i1p_ref[0, j], i1c_ref[0, j], i1n_ref[0, j], row_valid)
        frame_part = _conv2d_pack(
            i1x.reshape((rows + 2) * c2p, cl), wpk2f[:], rows, c2p
        )
        i2 = _lrelu(frame_part + bpart_ref[:] + b2[:].astype(jnp.float32))
        feat_flat = feat_ref[0, j].reshape(lp, cl)
        # out flat col c corresponds to feat grid col c+2: one PAIR shift.
        # The wrapped tail value is feat pair 0 of the tile's first row
        # (grid cols 0/1 — zeros by layout invariant) and masked anyway.
        center = pltpu.roll(feat_flat.astype(jnp.float32), lp - 1, 0)
        val = jnp.where(out_valid, center + i2, 0.0)
        # shift back: out flat col c -> padded grid col c+2 (one pair);
        # the wrapped head is val's masked zero tail — exact.
        val = pltpu.roll(val, 1, 0).astype(out_ref.dtype)
        out_ref[0, j] = val.reshape(rows, c2p, cl)


def conv0_pack_weights(k0):
    """[5,5,C,F] per-frame conv kernel -> [5,3,2C,2F] column-PAIR-grid
    conv kernel: output pair lane (pout*F+co) at pair q collects input
    pair q+pdx-1's lane (pin*C+ci) with the 5x5 tap at horizontal offset
    dx = 2*(pdx-1) + pin - pout (taps outside [-2,2] are structural
    zeros).  Lets a stock XLA conv emit the packed layout directly."""
    kh, kw, c, f = k0.shape
    assert (kh, kw) == (5, 5), (kh, kw)
    kp = jnp.zeros((5, 3, 2 * c, 2 * f), k0.dtype)
    for pdx in range(3):
        for pin in range(2):
            for pout in range(2):
                dx = 2 * (pdx - 1) + pin - pout
                if -2 <= dx <= 2:
                    kp = kp.at[:, pdx, pin * c:(pin + 1) * c,
                               pout * f:(pout + 1) * f].set(k0[:, dx + 2])
    return kp


def conv0_packed(frames5, k0, b0):
    """lrelu(conv5x5(frame, k0) + b0) for every frame, written DIRECTLY in
    the pair-packed chain layout [N,T,Hp,C2/2,128] of pad_to_pack_layout.

    frames5: [N,T,H,W,C] (C=3 post-non-local frames).  The conv's own
    (5,3) pair-grid kernel performs the relayout, so neither the unpacked
    [N*T,H,W,F] activation nor the separate pad/reshape pass is ever
    materialized (at PFNL bench geometry those were ~2.5 GB of HBM
    traffic per step).  Math identical to the reference's shared conv0
    (model/pfnl.py:61-62)."""
    n, t, h, w, c = frames5.shape
    f = k0.shape[-1]
    assert w % 2 == 0, w
    rows = pick_rows(h)
    hp = _round_up(h, rows)
    c2p = _round_up(w + 4, 32) // 2
    # pair the columns, then pad so a VALID (5,3) conv lands the image at
    # rows [0,h), pairs [1, 1+w/2) — the packed-layout convention
    yp = frames5.reshape(n, t, h, w // 2, 2 * c)
    yp = jnp.pad(yp, ((0, 0), (0, 0), (2, hp - h + 2),
                      (2, c2p - w // 2), (0, 0)))
    ypf = yp.reshape(n * t, hp + 4, c2p + 2, 2 * c)
    kp = conv0_pack_weights(k0).astype(ypf.dtype)
    o = jax.lax.conv_general_dilated(
        ypf, kp, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=_prec(ypf.dtype))
    o = _lrelu(o + jnp.tile(b0, 2).astype(o.dtype))
    # restore the packed-layout zero invariant outside the image support
    # (cheap: fuses into the conv epilogue)
    row = jax.lax.broadcasted_iota(jnp.int32, (1, hp, 1, 1), 1)
    q = jax.lax.broadcasted_iota(jnp.int32, (1, 1, c2p, 1), 2)
    o = jnp.where((row < h) & (q >= 1) & (q < 1 + w // 2), o, 0.0)
    return o.reshape(n, t, hp, c2p, 2 * f).astype(frames5.dtype)


def pad_to_pack_layout(feat, rows=16):
    """[B,T,H,W,C] (C=64) -> [B,T,Hp,C2/2,128]; image at rows [0,H),
    cols [2,W+2)."""
    n, t, h, w, c = feat.shape
    hp = _round_up(h, rows)
    c2 = _round_up(w + 4, 32)
    padded = jnp.pad(feat, ((0, 0), (0, 0), (0, hp - h), (2, c2 - w - 2), (0, 0)))
    return padded.reshape(n, t, hp, c2 // 2, 2 * c)


def unpad_from_pack_layout(packed, h, w, col0=2):
    """col0=2 for the carried feat layout; col0=1 for the i1/base grid
    (whose col c corresponds to image col c-1)."""
    n, t, hp, c2p, cl = packed.shape
    c = cl // 2
    return packed.reshape(n, t, hp, 2 * c2p, c)[:, :, :h, col0 : col0 + w, :]


def _specs(rows, tb, c2p, cl, hp):
    u = rows // 2
    n_units = hp // 2
    cur5 = pl.BlockSpec((1, tb, rows, c2p, cl), lambda b, i, tt: (b, tt, i, 0, 0))
    prev5 = pl.BlockSpec(
        (1, tb, 2, c2p, cl), lambda b, i, tt: (b, tt, jnp.maximum(i * u - 1, 0), 0, 0)
    )
    next5 = pl.BlockSpec(
        (1, tb, 2, c2p, cl),
        lambda b, i, tt: (b, tt, jnp.minimum((i + 1) * u, n_units - 1), 0, 0),
    )
    cur4 = pl.BlockSpec((1, rows, c2p, cl), lambda b, i, tt: (b, i, 0, 0))
    prev4 = pl.BlockSpec(
        (1, 2, c2p, cl), lambda b, i, tt: (b, jnp.maximum(i * u - 1, 0), 0, 0)
    )
    next4 = pl.BlockSpec(
        (1, 2, c2p, cl),
        lambda b, i, tt: (b, jnp.minimum((i + 1) * u, n_units - 1), 0, 0),
    )
    return cur5, prev5, next5, cur4, prev4, next4


def _pfrb_pack_pallas(packed, params, h, w, rows=16, tb=4,
                      want_intermediates=False):
    w1, b1, wfuse, bfuse, w2f, w2b, b2 = params
    n, t, hp, c2p, cl = packed.shape
    c = cl // 2
    assert t % tb == 0, (t, tb)
    assert hp % rows == 0, (hp, rows)
    n_tsteps = t // tb
    dtype = packed.dtype
    wpk1 = _pack_pair(w1.astype(dtype))
    wpk2f = _pack_pair(w2f.astype(dtype))
    wpk2b = _pack_pair(w2b.astype(dtype))
    wfuse_p = _pack_fuse(wfuse.astype(dtype), n_tsteps, tb)
    b1r = jnp.tile(b1.reshape(1, -1), (1, 2)).astype(jnp.float32)
    bfr = jnp.tile(bfuse.reshape(1, -1), (1, 2)).astype(jnp.float32)
    b2r = jnp.tile(b2.reshape(1, -1), (1, 2)).astype(jnp.float32)
    wspec = lambda arr: pl.BlockSpec(arr.shape, lambda b, i, tt: (0,) * arr.ndim)

    interp = jax.default_backend() == "cpu"
    cur5, prev5, next5, cur4, prev4, next4 = _specs(rows, tb, c2p, cl, hp)

    i1, base = pl.pallas_call(
        functools.partial(_kernel_a, rows=rows, c2p=c2p, h=h, w=w,
                          n_tsteps=n_tsteps, tb=tb),
        grid=(n, hp // rows, n_tsteps),
        in_specs=[prev5, cur5, next5, wspec(wpk1), wspec(b1r), wspec(wfuse_p),
                  wspec(bfr)],
        out_specs=(cur5, cur4),
        out_shape=(
            jax.ShapeDtypeStruct((n, t, hp, c2p, cl), dtype),
            jax.ShapeDtypeStruct((n, hp, c2p, cl), dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interp,
    )(packed, packed, packed, wpk1, b1r, wfuse_p, bfr)

    out = pl.pallas_call(
        functools.partial(_kernel_b, rows=rows, c2p=c2p, h=h, w=w,
                          n_tsteps=n_tsteps, tb=tb),
        grid=(n, hp // rows, n_tsteps),
        in_specs=[prev5, cur5, next5, prev4, cur4, next4, cur5,
                  wspec(wpk2f), wspec(wpk2b), wspec(b2r)],
        out_specs=cur5,
        out_shape=jax.ShapeDtypeStruct((n, t, hp, c2p, cl), dtype),
        scratch_shapes=[pltpu.VMEM((rows * c2p, cl), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interp,
    )(i1, i1, i1, base, base, base, packed, wpk2f, wpk2b, b2r)
    if want_intermediates:
        return out, i1, base
    return out


def pick_rows(h: int) -> int:
    """Row-tile size minimizing the padded height (rows=20 at h=180 saves
    the 6.7% hp padding of rows=16 and measured ~8% block time)."""
    cands = [(_round_up(h, r), -r, r) for r in (12, 16, 20)]
    return min(cands)[2]


def pick_tb(t: int) -> int:
    """Largest frame group that doesn't inflate the padded T (tb=8 wins
    slightly when it fits: fewer programs, amortized weights)."""
    return 8 if _round_up(t, 8) == _round_up(t, 4) else 4


def _chain_pack_run(feat, params_list, collect=False, keep_final_packed=False,
                    prepacked_thw=None):
    """Run the packed chain; optionally collect (feat_in, i1, base) per
    block (raw packed buffers, for the manual backward).  With
    keep_final_packed (and collect=False) only the FINAL packed buffer is
    returned in the feats slot — for consumers like the fused tail kernel
    that want the packed layout without the training-time activation
    stash.  With prepacked_thw=(t, h, w), `feat` is ALREADY in the packed
    [B,T,Hp,C2/2,128] layout (e.g. born packed out of conv0_packed) and
    the pad/reshape pass is skipped entirely."""
    if prepacked_thw is None:
        n, t, h, w, c = feat.shape
        rows = pick_rows(h)
        packed = pad_to_pack_layout(feat, rows=rows)
    else:
        t, h, w = prepacked_thw
        rows = pick_rows(h)
        packed = feat
        assert packed.shape[2] == _round_up(h, rows), (packed.shape, h, rows)
    tb = pick_tb(t)
    tp = _round_up(t, tb)
    if tp != t:
        packed = jnp.pad(packed, ((0, 0), (0, tp - t), (0, 0), (0, 0), (0, 0)))
    feats, i1s, bases = [], [], []
    for p in params_list:
        if tp != t:
            w1, b1, wfuse, bfuse, w2f, w2b, b2 = p
            wfuse = jnp.pad(wfuse, ((0, tp - t), (0, 0), (0, 0)))
            p = (w1, b1, wfuse, bfuse, w2f, w2b, b2)
        if collect:
            # keep the RAW packed buffers (no copies in the forward); the
            # backward unpads them lazily
            feats.append(packed)
            out_p, i1_p, base_p = _pfrb_pack_pallas(
                packed, p, h, w, rows, tb=tb, want_intermediates=True)
            i1s.append(i1_p)
            bases.append(base_p)
            packed = out_p
        else:
            packed = _pfrb_pack_pallas(packed, p, h, w, rows, tb=tb)
    out = unpad_from_pack_layout(packed[:, :t], h, w)
    if collect:
        feats.append(packed)
        return out, (feats, i1s, bases)
    if keep_final_packed:
        return out, ([packed], i1s, bases)
    return out


@jax.custom_vjp
def pfrb_chain_pack(feat, params_list):
    """N fused PFRBs on the pair-packed layout.

    T is padded to a multiple of the frame-group size; padded frames carry
    zero fusion weights so they never affect real frames.  The backward
    pass is the MANUAL gradient computed from the forward's saved
    (feat, i1, base) activations — no forward recompute (the i1/base come
    free out of kernel A)."""
    return _chain_pack_run(feat, params_list, collect=False)


def _conv_nhwc(x, k):
    return jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=_prec(x.dtype),
    )


def _conv_x_grad(dy, k):
    """Gradient w.r.t. the input of a stride-1 SAME conv: conv with the
    spatially mirrored, channel-transposed kernel."""
    return _conv_nhwc(dy, k[::-1, ::-1].transpose(0, 1, 3, 2))


def _conv_w_grad(x, dy):
    """[B,H,W,Ci],[B,H,W,Co] -> [3,3,Ci,Co] weight gradient of a stride-1
    SAME 3x3 conv: a conv with batch as the contraction ('CHWN','IHWO')
    so XLA uses its native weight-gradient kernel."""
    return jax.lax.conv_general_dilated(
        x, dy, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("CHWN", "IHWO", "HWNC"),
        preferred_element_type=jnp.float32,
        precision=_prec(x.dtype),
    )


_ALPHA = 0.2


def _lrelu_mask(y):
    """lrelu'(z) recovered from the OUTPUT sign (valid since alpha>0).

    At cells where |z| is within float rounding of the kink (~1e-7 of 0),
    the recovered slope may differ from XLA autodiff's choice — the
    subgradient there is genuinely ambiguous ([alpha, 1]); measured: ~1
    cell per ~8M at f32, bounded 5x local multiplier difference."""
    return jnp.where(y > 0, 1.0, _ALPHA).astype(jnp.float32)


def _chain_manual_bwd(res, g):
    feats_p, i1s_p, bases_p, params_list = res
    nb = len(params_list)
    n, t, h, w, c = g.shape
    feats = [unpad_from_pack_layout(p[:, :t], h, w) for p in feats_p]
    i1s = [unpad_from_pack_layout(p[:, :t], h, w, col0=1) for p in i1s_p]
    bases = [unpad_from_pack_layout(p[:, None], h, w, col0=1)[:, 0]
             for p in bases_p]
    ct = feats[0].dtype  # compute in the activation dtype (bf16 on TPU),
    # matching the XLA-autodiff cost; reductions accumulate in f32
    fold = lambda x: x.reshape(n * t, h, w, c)
    unfold = lambda x: x.reshape(n, t, h, w, c)
    fsum = lambda x, ax: jnp.sum(x.astype(jnp.float32), axis=ax)

    alpha = jnp.asarray(_ALPHA, ct)
    one = jnp.asarray(1.0, ct)
    mask = lambda y: jnp.where(y > 0, one, alpha)

    d_out = g.astype(ct)
    d_params = []
    for k in reversed(range(nb)):
        w1, b1, wfuse, bfuse, w2f, w2b, b2 = params_list[k]
        feat, i1, base = feats[k], i1s[k], bases[k]
        i2 = feats[k + 1] - feat
        dz2 = d_out * mask(i2)
        dz2_4 = fold(dz2)
        d_i1 = unfold(_conv_x_grad(dz2_4, w2f))
        d_w2f = _conv_w_grad(fold(i1), dz2_4)
        d_b2 = fsum(dz2, (0, 1, 2, 3))
        dz2_sum = jnp.sum(dz2.astype(jnp.float32), axis=1).astype(ct)
        d_base = _conv_x_grad(dz2_sum, w2b)      # base broadcast over frames
        d_w2b = _conv_w_grad(base, dz2_sum)
        dzb = d_base * mask(base)
        d_i1 = d_i1 + jnp.einsum("nhwd,tcd->nthwc", dzb, wfuse.astype(ct),
                                 precision=_prec(ct)).astype(ct)
        d_wfuse = jnp.einsum("nthwc,nhwd->tcd", i1, dzb,
                             preferred_element_type=jnp.float32,
                             precision=_prec(ct))
        d_bfuse = fsum(dzb, (0, 1, 2))
        dz1 = d_i1 * mask(i1)
        dz1_4 = fold(dz1)
        d_feat = d_out + unfold(_conv_x_grad(dz1_4, w1))
        d_w1 = _conv_w_grad(fold(feat), dz1_4)
        d_b1 = fsum(dz1, (0, 1, 2, 3))
        d_params.append(tuple(
            x.astype(p.dtype) for x, p in zip(
                (d_w1, d_b1, d_wfuse, d_bfuse, d_w2f, d_w2b, d_b2),
                params_list[k])
        ))
        d_out = d_feat
    return d_out.astype(g.dtype), list(reversed(d_params))


def _fwd(feat, params_list):
    out, (feats, i1s, bases) = _chain_pack_run(feat, params_list, collect=True)
    return out, (feats, i1s, bases, params_list)


def _chain_bwd_dispatch(res, g):
    """Pallas backward kernels on TPU; the manual XLA gradient elsewhere
    (both consume the same saved packed activations — no recompute)."""
    if jax.default_backend() == "tpu":
        from pfnl_tpu.ops.pallas.pfrb_bwd import chain_bwd_pallas

        feats_p, i1s_p, bases_p, params_list = res
        n, t, h, w, c = g.shape
        return chain_bwd_pallas(feats_p, i1s_p, bases_p, params_list, g,
                                h, w, pick_rows(h), pick_tb(t))
    return _chain_manual_bwd(res, g)


pfrb_chain_pack.defvjp(_fwd, _chain_bwd_dispatch)
