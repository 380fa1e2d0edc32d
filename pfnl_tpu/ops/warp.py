"""Optical-flow warping: bilinear backward (gather) and forward (splat) warps.

Coordinate convention (reference modules/videosr_ops.py:284-303 `meshgrid`):
flow channel 0 is x (column displacement), channel 1 is y (row displacement).
Target coords are scaled by the out/in ratio, enabling the SPMC
"upscale-while-warping" trick DRVSR uses (model/drvsr.py:145 warps LR frames
directly onto the HR grid).  The reference scales x by out_h/h and y by
out_w/w (modules/videosr_ops.py:407-408) — a benign quirk because every call
site uses equal ratios; we replicate it verbatim so behaviour is identical
even if a caller ever passes unequal ratios.

Backward warp = bilinear gather; output clipped to [0,1] like the reference
(modules/videosr_ops.py:391).  Forward warp = bilinear splat implemented with
`jax.ops.segment_sum` (the TPU-native analogue of the reference's
CPU-pinned `tf.unsorted_segment_sum`, modules/videosr_ops.py:467-471);
indices are clipped — not masked — at the borders, matching the reference's
accumulate-at-border semantics.  Both are differentiable through the
segment-sum/gather adjoints, matching the reference's gradient paths.
"""

import functools

import jax
import jax.numpy as jnp


def _fold5d(x):
    if x.ndim == 5:
        n, t = x.shape[:2]
        return x.reshape((n * t,) + x.shape[2:]), (n, t)
    return x, None


def _coords(uv: jax.Array, h: int, w: int, out_h: int, out_w: int):
    """Scaled absolute sampling coordinates + bilinear taps/weights.

    Returns (x0, x1, y0, y1) int32 clipped taps and (wa, wb, wc, wd) weights
    with the reference's weight<->index pairing:
      a=(y0,x0) b=(y1,x0) c=(y0,x1) d=(y1,x1)."""
    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    x = (gx + uv[..., 0]) * (out_h / h)  # quirk preserved: x scaled by height ratio
    y = (gy + uv[..., 1]) * (out_w / w)  # quirk preserved: y scaled by width ratio
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    x1f = x0f + 1.0
    y1f = y0f + 1.0
    wa = (x1f - x) * (y1f - y)
    wb = (x1f - x) * (y - y0f)
    wc = (x - x0f) * (y1f - y)
    wd = (x - x0f) * (y - y0f)
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, out_w - 1)
    x1 = jnp.clip(x1f.astype(jnp.int32), 0, out_w - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, out_h - 1)
    y1 = jnp.clip(y1f.astype(jnp.int32), 0, out_h - 1)
    return (x0, x1, y0, y1), (wa, wb, wc, wd)


def backward_warp(im: jax.Array, uv: jax.Array, out_size=None) -> jax.Array:
    """Bilinear gather-warp (reference imwarp_backward,
    modules/videosr_ops.py:306-396).

    im: [B,H,W,C] (or [B,T,H,W,C]) source image; uv: same spatial shape,
    2 channels.  Output matches the input spatial shape and is clipped to
    [0,1].  The reference signature is imwarp_backward(uv, im, out_size);
    argument order here is (im, uv) for readability."""
    im, fold = _fold5d(im)
    uv, _ = _fold5d(uv)
    b, h, w, c = im.shape
    out_h, out_w = (h, w) if out_size is None else (int(out_size[0]), int(out_size[1]))
    (x0, x1, y0, y1), (wa, wb, wc, wd) = _coords(uv.astype(jnp.float32), h, w, out_h, out_w)

    bidx = jnp.arange(b, dtype=jnp.int32)[:, None, None]
    ia = im[bidx, y0, x0]
    ib = im[bidx, y1, x0]
    ic = im[bidx, y0, x1]
    id_ = im[bidx, y1, x1]
    out = wa[..., None] * ia + wb[..., None] * ib + wc[..., None] * ic + wd[..., None] * id_
    out = jnp.clip(out, 0.0, 1.0)
    if fold is not None:
        n, t = fold
        out = out.reshape(n, t, h, w, c)
    return out


def backward_warp_local(im: jax.Array, uv: jax.Array,
                        max_disp: int = 1) -> jax.Array:
    """`backward_warp` for BOUNDED flows (|uv| <= max_disp), same output
    size — gather-free.

    TPU gathers serialize per element; with a bounded displacement every
    output pixel reads only the (2R+2)^2 statically-shifted neighbours,
    so the bilinear gather becomes masked shift-MULTIPLIES of an
    edge-replicated canvas — one fused VPU loop, no gather in either the
    forward or the autodiff (the transpose of a static shift is a static
    shift).  Edge replication reproduces the reference's index clipping
    (modules/videosr_ops.py:355-366) bit-for-bit: a clipped tap reads the
    border pixel, which is exactly the padded value.  Output clipped to
    [0,1] like `backward_warp`.

    All in-model flows qualify: EasyFlow's coarse stage and LTD/FRVSR
    flows end in tanh (R=1); full EasyFlow output is a sum of two tanh
    stages (R=2)."""
    im, fold = _fold5d(im)
    uv, _ = _fold5d(uv)
    b, h, w, c = im.shape
    r = int(max_disp)
    p = r + 1
    uvf = uv.astype(jnp.float32)
    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    x = gx + uvf[..., 0]
    y = gy + uvf[..., 1]
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wa = (x0f + 1.0 - x) * (y0f + 1.0 - y)
    wb = (x0f + 1.0 - x) * (y - y0f)
    wc = (x - x0f) * (y0f + 1.0 - y)
    wd = (x - x0f) * (y - y0f)
    dx0 = x0f - gx  # integer-valued f32; compare in f32 (no relayout)
    dy0 = y0f - gy

    # accumulate CHANNEL-FIRST: with C minor (typically 1) every masked
    # shift-product would be tiled [.., C->128] in HBM — a 128x padded
    # temp per term that OOMs compilation at batch 112 720p.  With (h, w)
    # minor the temps tile at ~1.2x.  For C==1 the transposes are free
    # (layout-only); the Pallas bounded splat does the same (:228).
    imf = jnp.pad(im.astype(jnp.float32).transpose(0, 3, 1, 2),
                  ((0, 0), (0, 0), (p, p), (p, p)), mode="edge")
    out = jnp.zeros((b, c, h, w), jnp.float32)
    for dy in range(-r, r + 2):
        iy0 = (dy0 == dy).astype(jnp.float32)
        iy1 = (dy0 == dy - 1).astype(jnp.float32)
        qa = wa * iy0 + wb * iy1
        qc = wc * iy0 + wd * iy1
        for dx in range(-r, r + 2):
            ix0 = (dx0 == dx).astype(jnp.float32)
            ix1 = (dx0 == dx - 1).astype(jnp.float32)
            m = qa * ix0 + qc * ix1
            out = out + m[:, None] * imf[:, :, p + dy:p + dy + h,
                                         p + dx:p + dx + w]
    out = jnp.clip(out, 0.0, 1.0).astype(im.dtype).transpose(0, 2, 3, 1)
    if fold is not None:
        n, t = fold
        out = out.reshape(n, t, h, w, c)
    return out


def forward_warp_local(im: jax.Array, uv: jax.Array, max_disp: int = 1,
                       impl: str = "pallas") -> jax.Array:
    """Bilinear splat-warp for BOUNDED flows (|uv| <= max_disp), same
    output size — EXACTLY equivalent to `forward_warp` but scatter-free.

    TPU scatter/segment-sum is serial (measured 892 ms for a 720p batch-4
    splat); with a bounded displacement every source pixel touches only
    targets within `max_disp+1`, so the splat becomes (2R+2)^2 masked
    shift-adds on a padded canvas, with the margins folded onto the border
    (the reference CLIPS out-of-range indices, videosr_ops.py:455-466 —
    folding reproduces that accumulate-at-border behaviour bit-for-bit).

    impl="pallas" (default) runs the accumulation in a single-pass VMEM
    kernel (ops/pallas/bounded_splat.py) with an analytic gather adjoint;
    impl="xla" keeps the chained `.at[].add` rewrite (the oracle the
    kernel is tested against, and the GSPMD-partitionable fallback).

    FRVSR qualifies with R=1: its flow net ends in tanh and the HR resize
    does NOT rescale the values (model/frvsr.py:100 quirk)."""
    if impl == "pallas":
        im, fold = _fold5d(im)
        uv, _ = _fold5d(uv)
        out = _bsplat_core(im, uv, int(max_disp))
        if fold is not None:
            n, t = fold
            out = out.reshape((n, t) + out.shape[1:])
        return out
    im, fold = _fold5d(im)
    uv, _ = _fold5d(uv)
    b, h, w, c = im.shape
    r = int(max_disp)
    p = r + 1
    uvf = uv.astype(jnp.float32)
    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    x = gx + uvf[..., 0]
    y = gy + uvf[..., 1]
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wa = (x0f + 1.0 - x) * (y0f + 1.0 - y)
    wb = (x0f + 1.0 - x) * (y - y0f)
    wc = (x - x0f) * (y0f + 1.0 - y)
    wd = (x - x0f) * (y - y0f)
    dx0 = (x0f - gx).astype(jnp.int32)
    dy0 = (y0f - gy).astype(jnp.int32)

    # channel-first accumulation for the same layout reason as
    # backward_warp_local: C-minor (C==1) temps tile 128x in HBM
    imf = im.astype(jnp.float32).transpose(0, 3, 1, 2)  # [b,c,h,w]
    canvas = jnp.zeros((b, c, h + 2 * p, w + 2 * p), jnp.float32)
    for dy in range(-r, r + 2):
        iy0 = (dy0 == dy).astype(jnp.float32)
        iy1 = (dy0 == dy - 1).astype(jnp.float32)
        for dx in range(-r, r + 2):
            ix0 = (dx0 == dx).astype(jnp.float32)
            ix1 = (dx0 == dx - 1).astype(jnp.float32)
            m = (wa * iy0 * ix0 + wb * iy1 * ix0
                 + wc * iy0 * ix1 + wd * iy1 * ix1)
            canvas = canvas.at[:, :, p + dy:p + dy + h, p + dx:p + dx + w].add(
                imf * m[:, None])
    # fold the margins onto the borders (= the reference's index clip)
    mid = canvas[:, :, p:p + h]
    mid = mid.at[:, :, 0].add(canvas[:, :, :p].sum(axis=2))
    mid = mid.at[:, :, h - 1].add(canvas[:, :, p + h:].sum(axis=2))
    out = mid[:, :, :, p:p + w]
    out = out.at[:, :, :, 0].add(mid[:, :, :, :p].sum(axis=3))
    out = out.at[:, :, :, w - 1].add(mid[:, :, :, p + w:].sum(axis=3))
    out = out.transpose(0, 2, 3, 1).astype(im.dtype)
    if fold is not None:
        n, t = fold
        out = out.reshape(n, t, h, w, c)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _bsplat_core(im, uv, max_disp):
    return _bsplat_fwd(im, uv, max_disp)[0]


def _bsplat_fwd(im, uv, max_disp):
    from pfnl_tpu.ops.pallas.bounded_splat import bounded_splat_canvas

    b, h, w, c = im.shape
    r = int(max_disp)
    p = r + 1
    canvas = bounded_splat_canvas(
        im.transpose(0, 3, 1, 2), uv, r)           # [b, c, h+2p, w+2p]
    # fold the margins onto the borders (= the reference's index clip,
    # videosr_ops.py:455-466) — same tail as the XLA rewrite
    mid = canvas[:, :, p:p + h]
    mid = mid.at[:, :, 0].add(canvas[:, :, :p].sum(axis=2))
    mid = mid.at[:, :, h - 1].add(canvas[:, :, p + h:].sum(axis=2))
    out = mid[:, :, :, p:p + w]
    out = out.at[:, :, :, 0].add(mid[:, :, :, :p].sum(axis=3))
    out = out.at[:, :, :, w - 1].add(mid[:, :, :, p + w:].sum(axis=3))
    return out.transpose(0, 2, 3, 1).astype(im.dtype), (im, uv)


def _bsplat_bwd(max_disp, res, g):
    """Analytic adjoint of the bounded bilinear splat — four bilinear
    gathers of the cotangent at the (clipped) tap positions, exactly the
    autodiff of the XLA rewrite but with no scatter anywhere."""
    im, uv = res
    b, h, w, c = im.shape
    gf = g.astype(jnp.float32)
    imf = im.astype(jnp.float32)
    uvf = uv.astype(jnp.float32)

    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    x = gx + uvf[..., 0]
    y = gy + uvf[..., 1]
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    x1f = x0f + 1.0
    y1f = y0f + 1.0
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x1f.astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y1f.astype(jnp.int32), 0, h - 1)

    bidx = jnp.arange(b, dtype=jnp.int32)[:, None, None]
    ga = gf[bidx, y0, x0]  # [b,h,w,c]
    gb = gf[bidx, y1, x0]
    gc = gf[bidx, y0, x1]
    gd = gf[bidx, y1, x1]

    wa = (x1f - x) * (y1f - y)
    wb = (x1f - x) * (y - y0f)
    wc = (x - x0f) * (y1f - y)
    wd = (x - x0f) * (y - y0f)
    d_im = (wa[..., None] * ga + wb[..., None] * gb
            + wc[..., None] * gc + wd[..., None] * gd)
    d_x = (-(y1f - y)[..., None] * ga - (y - y0f)[..., None] * gb
           + (y1f - y)[..., None] * gc + (y - y0f)[..., None] * gd)
    d_y = (-(x1f - x)[..., None] * ga + (x1f - x)[..., None] * gb
           - (x - x0f)[..., None] * gc + (x - x0f)[..., None] * gd)
    d_uv = jnp.stack([(imf * d_x).sum(-1), (imf * d_y).sum(-1)], axis=-1)
    return d_im.astype(im.dtype), d_uv.astype(uv.dtype)


_bsplat_core.defvjp(_bsplat_fwd, _bsplat_bwd)


def forward_warp_local_spmc(im: jax.Array, uv: jax.Array, scale: int,
                            max_disp: int = 2) -> jax.Array:
    """SPMC upscale-while-warp splat for BOUNDED flows (|uv| <= max_disp
    at the input resolution), out = scale * in — equivalent to
    `forward_warp(im, uv, (h*scale, w*scale))` but scatter-free.

    Each source LR pixel p targets HR cells s*p + d with
    d in [-s*R, s*R+1]; grouping targets by their HR phase (d mod s)
    turns the splat into (2R+1)^2 LR shift-adds PER PHASE, assembled by a
    phase interleave, with the HR margins folded onto the border (= the
    reference's index clipping).  DRVSR's EasyFlow-driven SPMC qualifies
    with R=2 (tanh-bounded two-stage flow).

    STATUS: exact (tested), but measured SLOWER than the segment-sum
    splat in DRVSR end-to-end on v5e — XLA does not fuse the 400-term
    masked add chain; DRVSR keeps segment_sum.  Kept as the starting
    point for a Pallas version if SPMC ever dominates a profile."""
    im, fold = _fold5d(im)
    uv, _ = _fold5d(uv)
    b, h, w, c = im.shape
    s = int(scale)
    r = int(max_disp)
    pl_ = r + 1
    uvf = uv.astype(jnp.float32)
    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    # reference coordinate scaling (videosr_ops.py:407-408; ratios equal)
    x = (gx + uvf[..., 0]) * s
    y = (gy + uvf[..., 1]) * s
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wa = (x0f + 1.0 - x) * (y0f + 1.0 - y)
    wb = (x0f + 1.0 - x) * (y - y0f)
    wc = (x - x0f) * (y0f + 1.0 - y)
    wd = (x - x0f) * (y - y0f)
    dx0 = (x0f - s * gx).astype(jnp.int32)
    dy0 = (y0f - s * gy).astype(jnp.int32)

    imf = im.astype(jnp.float32)
    h2, w2 = h + 2 * pl_, w + 2 * pl_
    phases = []
    for py in range(s):
        for px in range(s):
            canvas = jnp.zeros((b, h2, w2, c), jnp.float32)
            for ey in range(-r, r + 1):
                dy = s * ey + py
                iy0 = (dy0 == dy).astype(jnp.float32)
                iy1 = (dy0 == dy - 1).astype(jnp.float32)
                for ex in range(-r, r + 1):
                    dx = s * ex + px
                    ix0 = (dx0 == dx).astype(jnp.float32)
                    ix1 = (dx0 == dx - 1).astype(jnp.float32)
                    m = (wa * iy0 * ix0 + wb * iy1 * ix0
                         + wc * iy0 * ix1 + wd * iy1 * ix1)
                    canvas = canvas.at[
                        :, pl_ + ey:pl_ + ey + h, pl_ + ex:pl_ + ex + w, :
                    ].add(imf * m[..., None])
            phases.append(canvas)
    ph = jnp.stack(phases).reshape(s, s, b, h2, w2, c)
    hr = ph.transpose(2, 3, 0, 4, 1, 5).reshape(b, h2 * s, w2 * s, c)
    m_ = pl_ * s
    oh, ow = h * s, w * s
    mid = hr[:, m_:m_ + oh]
    mid = mid.at[:, 0].add(hr[:, :m_].sum(axis=1))
    mid = mid.at[:, oh - 1].add(hr[:, m_ + oh:].sum(axis=1))
    out = mid[:, :, m_:m_ + ow]
    out = out.at[:, :, 0].add(mid[:, :, :m_].sum(axis=2))
    out = out.at[:, :, ow - 1].add(mid[:, :, m_ + ow:].sum(axis=2))
    out = out.astype(im.dtype)
    if fold is not None:
        n, t = fold
        out = out.reshape(n, t, oh, ow, c)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _spmc_core(im, uv, scale, max_disp):
    return _spmc_fwd(im, uv, scale, max_disp)[0]


def _spmc_fwd(im, uv, scale, max_disp):
    from pfnl_tpu.ops.pallas.spmc_splat import spmc_phases

    b, h, w, c = im.shape
    s, r = int(scale), int(max_disp)
    p = r + 1
    h2, w2 = h + 2 * p, w + 2 * p
    phases = spmc_phases(im[..., 0], uv, s, r)          # [b, s*s, h2, w2]
    ph = phases.reshape(b, s, s, h2, w2)
    hr = ph.transpose(0, 3, 1, 4, 2).reshape(b, h2 * s, w2 * s)
    # fold the margins onto the borders (= the reference's index clip,
    # videosr_ops.py:455-466) — same tail as forward_warp_local_spmc
    m_ = p * s
    oh, ow = h * s, w * s
    mid = hr[:, m_:m_ + oh]
    mid = mid.at[:, 0].add(hr[:, :m_].sum(axis=1))
    mid = mid.at[:, oh - 1].add(hr[:, m_ + oh:].sum(axis=1))
    out = mid[:, :, m_:m_ + ow]
    out = out.at[:, :, 0].add(mid[:, :, :m_].sum(axis=2))
    out = out.at[:, :, ow - 1].add(mid[:, :, m_ + ow:].sum(axis=2))
    return out[..., None].astype(im.dtype), (im, uv)


def _spmc_bwd(scale, max_disp, res, g):
    """Analytic adjoint of the bilinear splat — gathers of the cotangent
    at the (clipped) tap positions, identical to segment_sum's adjoint
    but without any scatter in either direction."""
    im, uv = res
    b, h, w, c = im.shape
    s = int(scale)
    oh, ow = h * s, w * s
    g2 = g[..., 0].astype(jnp.float32)
    imf = im[..., 0].astype(jnp.float32)
    uvf = uv.astype(jnp.float32)

    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    x = (gx + uvf[..., 0]) * s
    y = (gy + uvf[..., 1]) * s
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    x1f = x0f + 1.0
    y1f = y0f + 1.0
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, ow - 1)
    x1 = jnp.clip(x1f.astype(jnp.int32), 0, ow - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, oh - 1)
    y1 = jnp.clip(y1f.astype(jnp.int32), 0, oh - 1)

    bidx = jnp.arange(b, dtype=jnp.int32)[:, None, None]
    ga = g2[bidx, y0, x0]
    gb = g2[bidx, y1, x0]
    gc = g2[bidx, y0, x1]
    gd = g2[bidx, y1, x1]

    wa = (x1f - x) * (y1f - y)
    wb = (x1f - x) * (y - y0f)
    wc = (x - x0f) * (y1f - y)
    wd = (x - x0f) * (y - y0f)
    d_im = wa * ga + wb * gb + wc * gc + wd * gd
    d_x = -(y1f - y) * ga - (y - y0f) * gb + (y1f - y) * gc + (y - y0f) * gd
    d_y = -(x1f - x) * ga + (x1f - x) * gb - (x - x0f) * gc + (x - x0f) * gd
    d_uv = jnp.stack([s * imf * d_x, s * imf * d_y], axis=-1)
    return d_im[..., None].astype(im.dtype), d_uv.astype(uv.dtype)


_spmc_core.defvjp(_spmc_fwd, _spmc_bwd)


def forward_warp_spmc(im: jax.Array, uv: jax.Array, scale: int,
                      max_disp: int = 2) -> jax.Array:
    """SPMC upscale-while-warp splat for BOUNDED single-channel inputs —
    equivalent to `forward_warp(im, uv, (h*scale, w*scale))` but with the
    splat accumulation in a Pallas kernel (ops/pallas/spmc_splat.py) and
    an analytic gather-based gradient (no scatter anywhere).

    im: [B,H,W,1] or [N,T,H,W,1]; uv with |uv| <= max_disp (DRVSR's
    EasyFlow-driven SPMC qualifies with R=2, model/drvsr.py:145)."""
    im, fold = _fold5d(im)
    uv, _ = _fold5d(uv)
    b, h, w, c = im.shape
    assert c == 1, "forward_warp_spmc is single-channel (Y) only"
    out = _spmc_core(im, uv, int(scale), int(max_disp))
    if fold is not None:
        n, t = fold
        out = out.reshape(n, t, h * scale, w * scale, c)
    return out


def forward_warp(im: jax.Array, uv: jax.Array, out_size=None) -> jax.Array:
    """Bilinear splat-warp (reference imwarp_forward,
    modules/videosr_ops.py:399-503).

    im: [B,H,W,C] or [B,T,H,W,C]; uv: [B,H,W,2] at the *input* resolution.
    out_size may exceed the input size (SPMC upscale-while-warp)."""
    im, fold = _fold5d(im)
    b, h, w, c = im.shape
    out_h, out_w = (h, w) if out_size is None else (int(out_size[0]), int(out_size[1]))
    (x0, x1, y0, y1), (wa, wb, wc, wd) = _coords(uv.astype(jnp.float32), h, w, out_h, out_w)

    base = jnp.arange(b, dtype=jnp.int32)[:, None, None] * (out_h * out_w)
    ids = [
        (base + y0 * out_w + x0).reshape(-1),
        (base + y1 * out_w + x0).reshape(-1),
        (base + y0 * out_w + x1).reshape(-1),
        (base + y1 * out_w + x1).reshape(-1),
    ]
    flat_im = im.reshape(-1, c)
    data = [
        (wa.reshape(-1, 1) * flat_im),
        (wb.reshape(-1, 1) * flat_im),
        (wc.reshape(-1, 1) * flat_im),
        (wd.reshape(-1, 1) * flat_im),
    ]
    out = jax.ops.segment_sum(
        jnp.concatenate(data, axis=0),
        jnp.concatenate(ids, axis=0),
        num_segments=b * out_h * out_w,
    )
    out = out.reshape(b, out_h, out_w, c)
    if fold is not None:
        n, t = fold
        out = out.reshape(n, t, out_h, out_w, c)
    return out
