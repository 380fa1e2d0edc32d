"""Model-level golden tests against hand-written numpy oracles.

The oracles are transcribed INDEPENDENTLY from the reference formulas
(float64 numpy, loop/pad style) — not from the pfnl_tpu implementations —
so they anchor the full model wiring to an external source of truth:

  * PFNL forward (reference model/pfnl.py:39-80 + utils.py:18-71):
    catches drift in the PFRB algebraic refactor (concat-conv == split
    conv sums), the NonLocal residual wiring, bias placement, the
    space/depth shuffles, and the TF1-legacy bicubic path.
  * FRVSR first step (reference model/frvsr.py:41-66): catches drift in
    the residual trunk and the stride-2 transpose-conv semantics,
    including the TF conv2d_transpose <-> flax ConvTranspose kernel
    mapping (mirror + in/out transpose) that a checkpoint importer needs.
  * VESPCN forward (model/vespcn.py:51-106 + modules/model_easyflow.py):
    the two-stage EASYFLOW flow (stride-2 TF-SAME convs, tanh sub-pixel
    reassembly, clipped backward warp), forward-splat MC, PReLU trunk,
    _PS shuffles and the bicubic-Y residual; EASYFLOW is shared by
    MCResNet/DRVSR.
  * LTDVSR forward (model/ltdvsr.py:51-149): the inline pooled flow,
    the three temporal branches and the softmax temporal weighting.
  * MCResNet forward (model/mcresnet.py:49-117): the distance-shared
    encoders and the odd trunk accumulation quirk.
  * DUF forward, FR_16L (model/dufvsr.py:38-58 + model/nets.py:9-53):
    dense 3-D blocks with temporal-VALID shrink, the hand-rolled eval
    BatchNorm, the softmaxed dynamic-filter head and the per-RGB
    5x5 dynamic filtering + depth_to_space composition.
  * DRVSR forward (model/drvsr.py:104-205): the SPMC upscale-while-warp
    splat (incl. the height/width coordinate-scaling quirk), the
    encoder/ConvLSTM/decoder with skip adds and k=4 transpose convs, and
    the (i,j,f,o) gate order with forget bias 1.

All seven families are covered.

Weights are seeded-random but FIXED, injected into the flax params by
name; the same arrays parameterize the oracle (reshaped to the
reference's concatenated-kernel layouts where the repo splits them).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


# ---------------------------------------------------------------- oracle ops

def np_lrelu(x, alpha=0.2):
    return np.maximum(x, alpha * x)


def np_conv2d(x, k, b=None):
    """SAME zero-padded conv, NHWC / HWIO, float64."""
    n, h, w, cin = x.shape
    kh, kw, _, cout = k.shape
    ph, pw = kh // 2, kw // 2
    xp = np.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    out = np.zeros((n, h, w, cout))
    for dy in range(kh):
        for dx in range(kw):
            out += xp[:, dy:dy + h, dx:dx + w, :] @ k[dy, dx]
    if b is not None:
        out += b
    return out


def np_conv2d_transpose_tf(y, k_tf, b, stride):
    """TF conv2d_transpose, SAME, kernel [kh, kw, C_OUT, C_IN] (TF order),
    output size in*stride: the gradient of a SAME stride-`stride` conv
    (pad_begin = (k - stride) // 2 for even outputs): per spatial dim
    out[stride*j + dy - pb] += y[j] * k[dy]."""
    n, h, w, cin = y.shape
    kh, kw, cout, _ = k_tf.shape
    oh, ow = h * stride, w * stride
    pby, pbx = max(kh - stride, 0) // 2, max(kw - stride, 0) // 2
    out = np.zeros((n, oh, ow, cout))
    for j in range(h):
        for i in range(w):
            for dy in range(kh):
                for dx in range(kw):
                    r, c = stride * j + dy - pby, stride * i + dx - pbx
                    if 0 <= r < oh and 0 <= c < ow:
                        out[:, r, c, :] += y[:, j, i, :] @ k_tf[dy, dx].T
    return out + b


def np_s2d(x, r):
    n, hr, wr, c = x.shape
    h, w = hr // r, wr // r
    return (x.reshape(n, h, r, w, r, c).transpose(0, 1, 3, 2, 4, 5)
            .reshape(n, h, w, r * r * c))


def np_d2s(x, r):
    n, h, w, crr = x.shape
    c = crr // (r * r)
    return (x.reshape(n, h, w, r, r, c).transpose(0, 1, 3, 2, 4, 5)
            .reshape(n, h * r, w * r, c))


def _np_keys(x, a=-0.75):
    x = np.abs(x)
    out = np.where(x <= 1, (a + 2) * x**3 - (a + 3) * x**2 + 1, 0.0)
    return np.where((x > 1) & (x < 2), a * (x**3 - 5 * x**2 + 8 * x - 4), out)


def np_resize_tf1(x, oh, ow, method="bicubic"):
    """TF1 resize_images(align_corners=False) legacy mapping src=dst*scale
    with index clamping (reference modules/videosr_ops.py:60-68 call
    sites)."""
    def axis_matrix(n_in, n_out):
        dst = np.arange(n_out)
        src = dst * (n_in / n_out)
        base = np.floor(src).astype(int)
        m = np.zeros((n_out, n_in))
        taps = range(-1, 3) if method == "bicubic" else range(0, 2)
        for t in taps:
            idx = np.clip(base + t, 0, n_in - 1)
            wgt = (_np_keys(src - (base + t)) if method == "bicubic"
                   else np.maximum(0, 1 - np.abs(src - (base + t))))
            for o in range(n_out):
                m[o, idx[o]] += wgt[o]
        return m

    n, h, w, c = x.shape
    mh, mw = axis_matrix(h, oh), axis_matrix(w, ow)
    return np.einsum("oh,nhwc,pw->nopc", mh, x, mw)


# ---------------------------------------------------------------- PFNL

def pfnl_oracle(x, p, t, scale=4, mf=64):
    """Reference PFNL forward (model/pfnl.py:39-80) in numpy float64.
    p: dict of weight arrays in the REFERENCE's concatenated layouts."""
    n, _, h, w, c = x.shape
    frames = [x[:, i] for i in range(t)]
    inp0 = np.concatenate(frames, -1)                      # pfnl.py:55-56
    inp1 = np_s2d(inp0, 2)                                 # :57
    # NonLocalBlock gaussian (utils.py:18-71): g conv, theta=phi=input
    g = np_conv2d(inp1, p["g_k"], p["g_b"])
    nn_, hh, ww, cc = inp1.shape
    th = inp1.reshape(nn_, hh * ww, cc)
    f = np.exp(th @ th.transpose(0, 2, 1))                 # utils.py:57
    f = f / f.sum(-1, keepdims=True)                       # manual softmax :58
    y = (f @ g.reshape(nn_, hh * ww, cc)).reshape(nn_, hh, ww, cc)
    w_y = np_conv2d(y, p["w_k"], p["w_b"])                 # utils.py:70
    inp0 = inp0 + np_d2s(w_y, 2)                           # pfnl.py:59-60
    frames = [inp0[..., c * i:c * (i + 1)] for i in range(t)]
    feats = [np_lrelu(np_conv2d(fr, p["k0"], p["b0"])) for fr in frames]  # :62
    bic = np_resize_tf1(x[:, t // 2], h * scale, w * scale)               # :63
    # one PFRB in the reference's concat form (pfnl.py:65-71)
    i1 = [np_lrelu(np_conv2d(f_, p["w1"], p["b1"])) for f_ in feats]
    base = np_lrelu(np_conv2d(np.concatenate(i1, -1), p["wfuse_cat"], p["bfuse"]))
    for i in range(t):
        i2 = np_lrelu(np_conv2d(np.concatenate([base, i1[i]], -1),
                                p["w2_cat"], p["b2"]))
        feats[i] = feats[i] + i2
    merge = np_lrelu(np_conv2d(np.concatenate(feats, -1),
                               p["km1"], p["bm1"]))        # :73-74
    large1 = np_d2s(merge, 2)                              # :76
    out1 = np_conv2d(large1, p["km2"], p["bm2"])           # :77 (no act)
    out = np_d2s(out1, 2)                                  # :78
    return out + bic                                       # :80


def test_pfnl_golden_numpy():
    from pfnl_tpu.models.pfnl import PFNL

    rng = np.random.default_rng(42)
    t, h, w, mf = 3, 8, 8, 64
    x = rng.random((1, t, h, w, 3))
    cnl = 3 * t * 4  # non-local channels after space_to_depth(2)

    def W(*shape, s=0.1):
        return (rng.standard_normal(shape) * s)

    p = dict(
        g_k=W(1, 1, cnl, cnl), g_b=W(cnl),
        w_k=W(1, 1, cnl, cnl), w_b=W(cnl),
        k0=W(5, 5, 3, mf), b0=W(mf),
        w1=W(3, 3, mf, mf), b1=W(mf),
        wfuse_cat=W(1, 1, t * mf, mf), bfuse=W(mf),
        w2_cat=W(3, 3, 2 * mf, mf), b2=W(mf),
        km1=W(3, 3, t * mf, 48), bm1=W(48),
        km2=W(3, 3, 12, 12), bm2=W(12),
    )

    want = pfnl_oracle(x, p, t)

    model = PFNL(num_frames=t, num_blocks=1)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x, jnp.float32))
    params = jax.tree_util.tree_map(lambda a: a, variables["params"])
    params["nlblock_0"]["g"]["kernel"] = p["g_k"]
    params["nlblock_0"]["g"]["bias"] = p["g_b"]
    params["nlblock_0"]["w"]["kernel"] = p["w_k"]
    params["nlblock_0"]["w"]["bias"] = p["w_b"]
    params["conv0"]["kernel"] = p["k0"]
    params["conv0"]["bias"] = p["b0"]
    params["conv1_0_kernel"] = p["w1"]
    params["conv1_0_bias"] = p["b1"]
    # the repo's per-frame fusion weights are slices of the reference's
    # concatenated 1x1 kernel (frame-major channel groups)
    params["conv10_0_kernel"] = np.stack(
        [p["wfuse_cat"][0, 0, mf * i:mf * (i + 1), :] for i in range(t)])
    params["conv10_0_bias"] = p["bfuse"]
    # conv2 concat kernel splits into (base, frame) halves in that order
    params["conv2b_0_kernel"] = p["w2_cat"][:, :, :mf, :]
    params["conv2f_0_kernel"] = p["w2_cat"][:, :, mf:, :]
    params["conv2f_0_bias"] = p["b2"]
    params["convmerge1_kernel"] = p["km1"]
    params["convmerge1_bias"] = p["bm1"]
    params["convmerge2_kernel"] = p["km2"]
    params["convmerge2_bias"] = p["bm2"]
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), params)

    got = model.apply({"params": params}, jnp.asarray(x, jnp.float32))["sr"]
    got = np.asarray(got)[:, 0]
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


# ---------------------------------------------------------------- VESPCN

def np_conv2d_s2(x, k, b):
    """TF-SAME stride-2 conv (asymmetric pad: begin=total//2)."""
    n, h, w, cin = x.shape
    kh, kw, _, cout = k.shape
    oh, ow = -(-h // 2), -(-w // 2)
    pt = max((oh - 1) * 2 + kh - h, 0)
    pl = max((ow - 1) * 2 + kw - w, 0)
    xp = np.pad(x, ((0, 0), (pt // 2, pt - pt // 2), (pl // 2, pl - pl // 2),
                    (0, 0)))
    out = np.zeros((n, oh, ow, cout))
    for dy in range(kh):
        for dx in range(kw):
            out += xp[:, dy:dy + 2 * oh:2, dx:dx + 2 * ow:2, :] @ k[dy, dx]
    return out + b


def _np_backward_warp_clip(im, uv):
    """Bilinear gather warp, output clipped to [0,1] (imwarp_backward)."""
    b, h, w, c = im.shape
    out = np.zeros_like(im)
    for bi in range(b):
        for r in range(h):
            for cc in range(w):
                x = cc + uv[bi, r, cc, 0]
                y = r + uv[bi, r, cc, 1]
                x0, y0 = int(np.floor(x)), int(np.floor(y))
                acc = 0.0
                for (yy, xx, wgt) in (
                    (y0, x0, (x0 + 1 - x) * (y0 + 1 - y)),
                    (y0 + 1, x0, (x0 + 1 - x) * (y - y0)),
                    (y0, x0 + 1, (x - x0) * (y0 + 1 - y)),
                    (y0 + 1, x0 + 1, (x - x0) * (y - y0)),
                ):
                    acc = acc + wgt * im[bi, min(max(yy, 0), h - 1),
                                         min(max(xx, 0), w - 1)]
                out[bi, r, cc] = acc
    return np.clip(out, 0.0, 1.0)


def np_prelu(x, a):
    """reference modules/videosr_ops.py:44-51."""
    return np.maximum(x, 0) + a * (x - np.abs(x)) * 0.5


def np_easyflow(imga, imgb, p):
    """Reference EASYFLOW forward (modules/model_easyflow.py:64-106)."""
    n, h, w, _ = imga.shape
    inputs = np.concatenate([imga, imgb], -1)
    c1 = np.maximum(np_conv2d_s2(inputs, p["c1k"], p["c1b"]), 0)
    c2 = np.maximum(np_conv2d(c1, p["c2k"], p["c2b"]), 0)
    c3 = np.maximum(np_conv2d_s2(c2, p["c3k"], p["c3b"]), 0)
    c4 = np.maximum(np_conv2d(c3, p["c4k"], p["c4b"]), 0)
    c5 = np.tanh(np_conv2d(c4, p["c5k"], p["c5b"]))       # [n,h/4,w/4,32]
    c5_hr = c5.reshape(n, h // 4, w // 4, 2, 4, 4)
    c5_hr = c5_hr.transpose(0, 1, 4, 2, 5, 3).reshape(n, h, w, 2)
    img_warp = _np_backward_warp_clip(imgb, c5_hr)
    pack = np.concatenate([inputs, c5_hr, img_warp], -1)
    s1 = np.maximum(np_conv2d_s2(pack, p["s1k"], p["s1b"]), 0)
    s2 = np.maximum(np_conv2d(s1, p["s2k"], p["s2b"]), 0)
    s3 = np.maximum(np_conv2d(s2, p["s3k"], p["s3b"]), 0)
    s4 = np.maximum(np_conv2d(s3, p["s4k"], p["s4b"]), 0)
    s5 = np.tanh(np_conv2d(s4, p["s5k"], p["s5b"]))       # [n,h/2,w/2,8]
    s5_hr = s5.reshape(n, h // 2, w // 2, 2, 2, 2)
    s5_hr = s5_hr.transpose(0, 1, 4, 2, 5, 3).reshape(n, h, w, 2)
    return c5_hr + s5_hr


def vespcn_oracle(x, p, t=3, scale=4):
    """Reference VESPCN forward (model/vespcn.py:51-106) in numpy."""
    n, _, h, w, _ = x.shape
    idx0 = t // 2
    y = _np_rgb2y(x)
    ref = y[:, idx0]
    bic = np_resize_tf1(ref, h * scale, w * scale, method="bicubic")
    flat = y.reshape(n * t, h, w, 1)
    ref_rep = np.repeat(y[:, idx0:idx0 + 1], t, 1).reshape(n * t, h, w, 1)
    uv = np_easyflow(flat, ref_rep, p)
    warped = _np_forward_warp_same(flat, uv).reshape(n, t, h, w, 1)
    sr_in = warped.transpose(0, 2, 3, 1, 4).reshape(n, h, w, t)
    ai = iter(p["alphas"])
    xx = np_prelu(np_conv2d(sr_in, p["e1k"], p["e1b"]), next(ai))
    for i in range(9):
        xx = np_prelu(np_conv2d(xx, p[f"e2k{i}"], p[f"e2b{i}"]), next(ai))
    xx = np_prelu(np_conv2d(xx, p["c6k"], p["c6b"]), next(ai))
    xx = np_d2s(xx, 2)   # _PS proven == depth_to_space (test_ops_color_shuffle)
    xx = np_conv2d(xx, p["rok"], p["rob"])
    xx = np_d2s(xx, 2)
    return xx + bic


def test_vespcn_golden_numpy():
    from pfnl_tpu.models.vespcn import VESPCN

    rng = np.random.default_rng(23)
    t, h, w = 3, 8, 8
    x = rng.random((1, t, h, w, 3))

    def W(*shape, s=0.1):
        return rng.standard_normal(shape) * s

    p = dict(
        c1k=W(5, 5, 2, 24), c1b=W(24), c2k=W(3, 3, 24, 24), c2b=W(24),
        c3k=W(5, 5, 24, 24), c3b=W(24), c4k=W(3, 3, 24, 24), c4b=W(24),
        c5k=W(3, 3, 24, 32), c5b=W(32),
        s1k=W(5, 5, 5, 24), s1b=W(24), s2k=W(3, 3, 24, 24), s2b=W(24),
        s3k=W(3, 3, 24, 24), s3b=W(24), s4k=W(3, 3, 24, 24), s4b=W(24),
        s5k=W(3, 3, 24, 8), s5b=W(8),
        e1k=W(5, 5, t, 24), e1b=W(24), c6k=W(3, 3, 24, 16), c6b=W(16),
        rok=W(3, 3, 4, 4), rob=W(4),
        alphas=[W(24, s=0.3) for _ in range(10)] + [W(16, s=0.3)],
    )
    for i in range(9):
        p[f"e2k{i}"], p[f"e2b{i}"] = W(3, 3, 24, 24), W(24)

    want = vespcn_oracle(x, p)

    model = VESPCN(num_frames=t)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x, jnp.float32))
    params = variables["params"]
    ef = params["easyflow"]
    for name, kk in (("c1", "c1"), ("c2", "c2"), ("c3", "c3"), ("c4", "c4"),
                     ("c5", "c5"), ("s1", "s1"), ("s2", "s2"), ("s3", "s3"),
                     ("s4", "s4"), ("s5", "s5")):
        ef[name] = {"kernel": p[kk + "k"], "bias": p[kk + "b"]}
    params["enc1"] = {"kernel": p["e1k"], "bias": p["e1b"]}
    for i in range(9):
        params[f"enc2_{i}"] = {"kernel": p[f"e2k{i}"], "bias": p[f"e2b{i}"]}
    params["conv6"] = {"kernel": p["c6k"], "bias": p["c6b"]}
    params["rnn_out"] = {"kernel": p["rok"], "bias": p["rob"]}
    for i, a in enumerate(p["alphas"]):
        params[f"prelu_{i}"] = {"alpha": a}
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), params)

    got = np.asarray(model.apply({"params": params},
                                 jnp.asarray(x, jnp.float32))["sr"])[:, 0]
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


# ---------------------------------------------------------------- MCResNet

def mcresnet_oracle(x, p, t=5, scale=4):
    """Reference MCResNet forward (model/mcresnet.py:49-117) in numpy,
    including the distance-shared encoders and the odd trunk accumulation
    (merge += conv2, final head from conv2 — mcresnet.py:96-105)."""
    n, _, h, w, _ = x.shape
    idx0 = t // 2
    y = _np_rgb2y(x)
    ref = y[:, idx0]
    bic = np_resize_tf1(ref, h * scale, w * scale, method="bicubic")
    flat = y.reshape(n * t, h, w, 1)
    ref_rep = np.repeat(y[:, idx0:idx0 + 1], t, 1).reshape(n * t, h, w, 1)
    uv = np_easyflow(flat, ref_rep, p)
    warped = _np_forward_warp_same(flat, uv).reshape(n, t, h, w, 1)

    enc = [np_prelu(np_conv2d(warped[:, i], p[f"d{abs(i - idx0)}k"],
                              p[f"d{abs(i - idx0)}b"]), p["ea"][i])
           for i in range(t)]
    merge = np.concatenate(enc, -1)
    conv2 = merge
    for i in range(9):
        conv2 = np_prelu(np_conv2d(merge, p[f"r{i}k"], p[f"r{i}b"]), p["ra"][i])
        merge = conv2 if i == 0 else merge + conv2
    xx = np_prelu(np_conv2d(conv2, p["c6k"], p["c6b"]), p["c6a"])
    xx = np_d2s(xx, 2)
    xx = np_conv2d(xx, p["rok"], p["rob"])
    xx = np_d2s(xx, 2)
    return xx + bic


def test_mcresnet_golden_numpy():
    from pfnl_tpu.models.mcresnet import MCResNet

    rng = np.random.default_rng(31)
    t, h, w = 5, 8, 8
    x = rng.random((1, t, h, w, 3))

    def W(*shape, s=0.1):
        return rng.standard_normal(shape) * s

    p = dict(
        c1k=W(5, 5, 2, 24), c1b=W(24), c2k=W(3, 3, 24, 24), c2b=W(24),
        c3k=W(5, 5, 24, 24), c3b=W(24), c4k=W(3, 3, 24, 24), c4b=W(24),
        c5k=W(3, 3, 24, 32), c5b=W(32),
        s1k=W(5, 5, 5, 24), s1b=W(24), s2k=W(3, 3, 24, 24), s2b=W(24),
        s3k=W(3, 3, 24, 24), s3b=W(24), s4k=W(3, 3, 24, 24), s4b=W(24),
        s5k=W(3, 3, 24, 8), s5b=W(8),
        c6k=W(3, 3, 32, 16), c6b=W(16), c6a=W(16, s=0.3),
        rok=W(3, 3, 4, 4), rob=W(4),
        ea=[W(64, s=0.3) for _ in range(t)],
        ra=[W(32, s=0.3) for _ in range(9)],
    )
    for d in range(t // 2 + 1):
        p[f"d{d}k"], p[f"d{d}b"] = W(5, 5, 1, 64), W(64)
    p["r0k"], p["r0b"] = W(3, 3, 64 * t, 32), W(32)
    for i in range(1, 9):
        p[f"r{i}k"], p[f"r{i}b"] = W(3, 3, 32, 32), W(32)

    want = mcresnet_oracle(x, p)

    model = MCResNet(num_frames=t)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x, jnp.float32))
    params = variables["params"]
    ef = params["easyflow"]
    for name in ("c1", "c2", "c3", "c4", "c5", "s1", "s2", "s3", "s4", "s5"):
        ef[name] = {"kernel": p[name + "k"], "bias": p[name + "b"]}
    for d in range(t // 2 + 1):
        params[f"enc1_{d}"] = {"kernel": p[f"d{d}k"], "bias": p[f"d{d}b"]}
    for i in range(t):
        params[f"enc1_prelu_{i}"] = {"alpha": p["ea"][i]}
    for i in range(9):
        params[f"enc2_{i}"] = {"kernel": p[f"r{i}k"], "bias": p[f"r{i}b"]}
        params[f"enc2_prelu_{i}"] = {"alpha": p["ra"][i]}
    params["conv6"] = {"kernel": p["c6k"], "bias": p["c6b"]}
    params["conv6_prelu"] = {"alpha": p["c6a"]}
    params["rnn_out"] = {"kernel": p["rok"], "bias": p["rob"]}
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), params)

    got = np.asarray(model.apply({"params": params},
                                 jnp.asarray(x, jnp.float32))["sr"])[:, 0]
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


# ---------------------------------------------------------------- LTDVSR

def _np_maxpool2(x):
    n, h, w, c = x.shape
    return x.reshape(n, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))


def _np_rgb2y(x):
    scale = np.array([65.481, 128.553, 24.966]) / 255.0
    return (x * scale).sum(-1, keepdims=True) + 16.0 / 255.0


def _np_forward_warp_same(im, uv):
    """Bilinear forward splat, same size, clipped indices (reference
    imwarp_forward, videosr_ops.py:399-503)."""
    b, h, w, c = im.shape
    out = np.zeros_like(im)
    for bi in range(b):
        for r in range(h):
            for cc in range(w):
                x = cc + uv[bi, r, cc, 0]
                y = r + uv[bi, r, cc, 1]
                x0, y0 = int(np.floor(x)), int(np.floor(y))
                for (yy, xx, wgt) in (
                    (y0, x0, (x0 + 1 - x) * (y0 + 1 - y)),
                    (y0 + 1, x0, (x0 + 1 - x) * (y - y0)),
                    (y0, x0 + 1, (x - x0) * (y0 + 1 - y)),
                    (y0 + 1, x0 + 1, (x - x0) * (y - y0)),
                ):
                    out[bi, min(max(yy, 0), h - 1), min(max(xx, 0), w - 1)] += (
                        wgt * im[bi, r, cc]
                    )
    return out


def ltdvsr_oracle(x, p, t=5, scale=4):
    """Reference LTDVSR forward (model/ltdvsr.py:51-149) in numpy."""
    n, _, h, w, _ = x.shape
    idx0 = t // 2
    y = _np_rgb2y(x)                                    # [N,T,h,w,1]
    flat = y.reshape(n * t, h, w, 1)
    ref = np.repeat(y[:, idx0:idx0 + 1], t, 1).reshape(n * t, h, w, 1)
    # inline pooled flow net (ltdvsr.py:136-149)
    f = np.concatenate([ref, flat], -1)
    f = np.maximum(np_conv2d(f, p["fk0"], p["fb0"]), 0)
    f = _np_maxpool2(f)
    f = np.maximum(np_conv2d(f, p["fk1"], p["fb1"]), 0)
    f = _np_maxpool2(f)
    f = np_resize_tf1(f, h, w, method="bilinear")
    uv = np.tanh(np_conv2d(f, p["fk2"], p["fb2"]))
    warped = _np_forward_warp_same(flat, uv).reshape(n, t, h, w, 1)

    def branch(b, lo, hi):
        xx = warped[:, lo:hi].transpose(0, 2, 3, 1, 4).reshape(n, h, w, hi - lo)
        xx = np.maximum(np_conv2d(xx, p[f"b{b}k0"], p[f"b{b}b0"]), 0)
        xx = np.maximum(np_conv2d(xx, p[f"b{b}k1"], p[f"b{b}b1"]), 0)
        xx = np.maximum(np_conv2d(xx, p[f"b{b}k3"], p[f"b{b}b3"]), 0)
        xx = np_conv2d(xx, p[f"b{b}k2"], p[f"b{b}b2"])
        return np_d2s(xx, scale)

    est = [branch(0, idx0, idx0 + 1), branch(1, idx0 - 1, idx0 + 2),
           branch(2, idx0 - 2, idx0 + 3)]

    bil = np_resize_tf1(y.reshape(n * t, h, w, 1), h * scale, w * scale,
                        method="bilinear").reshape(n, t, h * scale, w * scale, 1)
    tem = bil.transpose(0, 2, 3, 1, 4).reshape(n, h * scale, w * scale, t)
    tem = np.maximum(np_conv2d(tem, p["tk0"], p["tb0"]), 0)
    tem = np.maximum(np_conv2d(tem, p["tk1"], p["tb1"]), 0)
    logits = np_conv2d(tem, p["tk2"], p["tb2"])
    e = np.exp(logits - logits.max(-1, keepdims=True))
    wgt = e / e.sum(-1, keepdims=True)
    return sum(est[i] * wgt[..., i:i + 1] for i in range(3))


def test_ltdvsr_golden_numpy():
    from pfnl_tpu.models.ltdvsr import LTDVSR

    rng = np.random.default_rng(11)
    t, h, w = 5, 8, 8
    x = rng.random((1, t, h, w, 3))

    def W(*shape, s=0.1):
        return rng.standard_normal(shape) * s

    p = dict(
        fk0=W(9, 9, 2, 32), fb0=W(32), fk1=W(9, 9, 32, 32), fb1=W(32),
        fk2=W(3, 3, 32, 2), fb2=W(2),
        tk0=W(5, 5, t, 32), tb0=W(32), tk1=W(5, 5, 32, 16), tb1=W(16),
        tk2=W(5, 5, 16, 3), tb2=W(3),
    )
    for b, cin in ((0, 1), (1, 3), (2, 5)):
        p[f"b{b}k0"], p[f"b{b}b0"] = W(5, 5, cin, 64), W(64)
        p[f"b{b}k1"], p[f"b{b}b1"] = W(3, 3, 64, 64), W(64)
        p[f"b{b}k3"], p[f"b{b}b3"] = W(3, 3, 64, 64), W(64)
        p[f"b{b}k2"], p[f"b{b}b2"] = W(3, 3, 64, 16), W(16)

    want = ltdvsr_oracle(x, p)

    model = LTDVSR(num_frames=t)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x, jnp.float32))
    params = variables["params"]
    params["flow"]["conv0"] = {"kernel": p["fk0"], "bias": p["fb0"]}
    params["flow"]["conv1"] = {"kernel": p["fk1"], "bias": p["fb1"]}
    params["flow"]["conv2"] = {"kernel": p["fk2"], "bias": p["fb2"]}
    for b in range(3):
        for i in (0, 1, 3, 2):
            params[f"conv{b}_{i}"] = {"kernel": p[f"b{b}k{i}"],
                                      "bias": p[f"b{b}b{i}"]}
    for i, (kk, bb) in enumerate((("tk0", "tb0"), ("tk1", "tb1"), ("tk2", "tb2"))):
        params[f"tem{i}"] = {"kernel": p[kk], "bias": p[bb]}
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), params)

    got = np.asarray(model.apply({"params": params},
                                 jnp.asarray(x, jnp.float32))["sr"])[:, 0]
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


# ---------------------------------------------------------------- FRVSR

def frvsr_first_step_oracle(x, p, nb, mf):
    """Reference FRVSR trunk, first frame (model/frvsr.py:41-66):
    conv0 -> nb residual blocks -> two stride-2 transpose convs -> out."""
    conv0 = np.maximum(np_conv2d(x, p["k00"], p["b00"]), 0)
    for j in range(nb):
        c1 = np.maximum(np_conv2d(conv0, p[f"k1_{j}"], p[f"b1_{j}"]), 0)
        c2 = np_conv2d(c1, p[f"k2_{j}"], p[f"b2_{j}"])
        conv0 = conv0 + c2
    xl = np.maximum(np_conv2d_transpose_tf(conv0, p["kl1"], p["bl1"], 2), 0)
    xl = np.maximum(np_conv2d_transpose_tf(xl, p["kl2"], p["bl2"], 2), 0)
    return np_conv2d(xl, p["ko"], p["bo"])


def test_frvsr_first_step_golden():
    from pfnl_tpu.models.frvsr import FRVSR

    rng = np.random.default_rng(7)
    nb, mf, h, w = 2, 8, 8, 8  # h,w must survive the flow U-net's 3 pools
    x = rng.random((1, h, w, 3))

    def W(*shape, s=0.2):
        return rng.standard_normal(shape) * s

    p = dict(
        k00=W(3, 3, 3, mf), b00=W(mf),
        kl1=W(3, 3, mf, mf), bl1=W(mf),   # TF layout [kh,kw,OUT,IN]
        kl2=W(3, 3, mf, mf), bl2=W(mf),
        ko=W(3, 3, mf, 3), bo=W(3),
    )
    for j in range(nb):
        p[f"k1_{j}"], p[f"b1_{j}"] = W(3, 3, mf, mf), W(mf)
        p[f"k2_{j}"], p[f"b2_{j}"] = W(3, 3, mf, mf), W(mf)

    want = frvsr_first_step_oracle(x, p, nb, mf)

    model = FRVSR(num_frames=2, mf=mf, num_blocks=nb)
    xj = jnp.asarray(x, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), xj[:, None].repeat(2, 1))
    params = variables["params"]
    params["conv0_0"]["kernel"] = p["k00"]
    params["conv0_0"]["bias"] = p["b00"]
    for j in range(nb):
        params[f"conv1_{j}"]["kernel"] = p[f"k1_{j}"]
        params[f"conv1_{j}"]["bias"] = p[f"b1_{j}"]
        params[f"conv2_{j}"]["kernel"] = p[f"k2_{j}"]
        params[f"conv2_{j}"]["bias"] = p[f"b2_{j}"]
    # TF conv2d_transpose kernel [kh,kw,out,in] -> flax ConvTranspose
    # [kh,kw,in,out] requires a spatial MIRROR + channel transpose
    # (lax.conv_transpose pads (2,1) and does not flip the kernel)
    for name, kk, bb in [("large1", "kl1", "bl1"), ("large2", "kl2", "bl2")]:
        k_tf = p[kk]
        params[name]["kernel"] = k_tf[::-1, ::-1].transpose(0, 1, 3, 2)
        params[name]["bias"] = p[bb]
    params["out"]["kernel"] = p["ko"]
    params["out"]["bias"] = p["bo"]
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), params)

    got = np.asarray(model.apply({"params": params}, xj, method=FRVSR.step))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


# ---------------------------------------------------------------- DUF

def np_conv3d(x, k, b=None, pad="none"):
    """VALID 3-D conv with explicit 'thw'/'hw' pre-padding, NDHWC/DHWIO."""
    if pad == "thw":
        x = np.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    elif pad == "hw":
        x = np.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    n, d, h, w, cin = x.shape
    kt, kh, kw, _, cout = k.shape
    od, oh, ow = d - kt + 1, h - kh + 1, w - kw + 1
    out = np.zeros((n, od, oh, ow, cout))
    for dt in range(kt):
        for dy in range(kh):
            for dx in range(kw):
                out += x[:, dt:dt + od, dy:dy + oh, dx:dx + ow, :] @ k[dt, dy, dx]
    if b is not None:
        out += b
    return out


def np_refbn_eval(x, beta, gamma, mmean, mvar):
    return gamma * (x - mmean) / np.sqrt(mvar + 1e-3) + beta


def duf_oracle(x, p, t=7, scale=4, n_thw=3, n_hw=3, growth=32):
    """Reference DUF forward with the FR_16L backbone
    (model/dufvsr.py:38-58 + model/nets.py:9-53) in numpy, eval mode."""
    n, _, h, w, _ = x.shape
    r2 = scale * scale
    idx0 = t // 2
    z = np_conv3d(x, p["c1k"], p["c1b"], pad="hw")
    feats = 64
    for r in range(n_thw + n_hw):
        tt = np.maximum(np_refbn_eval(z, *p[f"bn{r}a"]), 0)
        tt = np_conv3d(tt, p[f"ak{r}"], p[f"ab{r}"])
        tt = np.maximum(np_refbn_eval(tt, *p[f"bn{r}b"]), 0)
        if r < n_thw:
            tt = np_conv3d(tt, p[f"bk{r}"], p[f"bb{r}"], pad="thw")
            z = np.concatenate([z, tt], -1)
        else:
            tt = np_conv3d(tt, p[f"bk{r}"], p[f"bb{r}"], pad="hw")
            z = np.concatenate([z[:, 1:-1], tt], -1)
        feats += growth
    z = np.maximum(np_refbn_eval(z, *p["fbn1"]), 0)
    z = np.maximum(np_conv3d(z, p["c2k"], p["c2b"], pad="hw"), 0)
    rr = np.maximum(np_conv3d(z, p["r1k"], p["r1b"]), 0)
    rr = np_conv3d(rr, p["r2k"], p["r2b"])                 # [n,1,h,w,3*r2]
    ff = np.maximum(np_conv3d(z, p["f1k"], p["f1b"]), 0)
    ff = np_conv3d(ff, p["f2k"], p["f2b"]).reshape(n, 1, h, w, 25, r2)
    e = np.exp(ff - ff.max(4, keepdims=True))
    fx = e / e.sum(4, keepdims=True)                       # softmax over taps

    # per-RGB dynamic filtering of the center frame (dufvsr.py:47-53)
    center = x[:, idx0]                                    # [n,h,w,3]
    xp = np.pad(center, ((0, 0), (2, 2), (2, 2), (0, 0)))
    chans = []
    for cch in range(3):
        filt = np.zeros((n, h, w, r2))
        for i in range(5):
            for j in range(5):
                filt += xp[:, i:i + h, j:j + w, cch][..., None] * \
                    fx[:, 0, :, :, i * 5 + j, :]
        chans.append(np_d2s(filt, scale))
    sr = np.concatenate(chans, -1)                          # [n,H,W,3]
    return sr + np_d2s(rr[:, 0], scale)


def test_duf_golden_numpy():
    from pfnl_tpu.models.duf import DUF

    rng = np.random.default_rng(5)
    t, h, w = 7, 8, 8
    x = rng.random((1, t, h, w, 3))

    def W(*shape, s=0.1):
        return rng.standard_normal(shape) * s

    def BN(c):
        return (W(c, s=0.1), 1.0 + W(c, s=0.1),
                W(c, s=0.1), np.abs(W(c, s=0.5)) + 0.1)

    p = dict(c1k=W(1, 3, 3, 3, 64), c1b=W(64), fbn1=BN(64 + 6 * 32))
    feats = 64
    for r in range(6):
        p[f"bn{r}a"] = BN(feats)
        p[f"ak{r}"], p[f"ab{r}"] = W(1, 1, 1, feats, feats), W(feats)
        p[f"bn{r}b"] = BN(feats)
        p[f"bk{r}"], p[f"bb{r}"] = W(3, 3, 3, feats, 32), W(32)
        feats += 32
    p["c2k"], p["c2b"] = W(1, 3, 3, 256, 256), W(256)
    p["r1k"], p["r1b"] = W(1, 1, 1, 256, 256), W(256)
    p["r2k"], p["r2b"] = W(1, 1, 1, 256, 48), W(48)
    p["f1k"], p["f1b"] = W(1, 1, 1, 256, 512), W(512)
    p["f2k"], p["f2b"] = W(1, 1, 1, 512, 400), W(400)

    want = duf_oracle(x, p)

    model = DUF(num_frames=t, layers=16)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x, jnp.float32),
                           is_train=False)
    params, stats = variables["params"]["G"], variables["batch_stats"]["G"]
    params["conv1"] = {"W": p["c1k"], "b": p["c1b"]}
    for r in range(6):
        for suffix, bn in (("a", p[f"bn{r}a"]), ("b", p[f"bn{r}b"])):
            params[f"Rbn{r + 1}{suffix}"] = {"beta": bn[0], "gamma": bn[1]}
            # keep the init-created zero_debias shadows (eval ignores them)
            stats[f"Rbn{r + 1}{suffix}"] = dict(
                stats[f"Rbn{r + 1}{suffix}"],
                moving_mean=bn[2], moving_variance=bn[3])
        params[f"Rconv{r + 1}a"] = {"W": p[f"ak{r}"], "b": p[f"ab{r}"]}
        params[f"Rconv{r + 1}b"] = {"W": p[f"bk{r}"], "b": p[f"bb{r}"]}
    params["fbn1"] = {"beta": p["fbn1"][0], "gamma": p["fbn1"][1]}
    stats["fbn1"] = dict(stats["fbn1"], moving_mean=p["fbn1"][2],
                         moving_variance=p["fbn1"][3])
    params["conv2"] = {"W": p["c2k"], "b": p["c2b"]}
    params["rconv1"] = {"W": p["r1k"], "b": p["r1b"]}
    params["rconv2"] = {"W": p["r2k"], "b": p["r2b"]}
    params["fconv1"] = {"W": p["f1k"], "b": p["f1b"]}
    params["fconv2"] = {"W": p["f2k"], "b": p["f2b"]}
    variables = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32),
        {"params": {"G": params}, "batch_stats": {"G": stats}})

    got = np.asarray(model.apply(variables, jnp.asarray(x, jnp.float32),
                                 is_train=False)["sr"])[:, 0]
    # f32 lax.rsqrt in 13 BN layers vs the f64 oracle: ~2e-3 relative
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=4e-3)


# ---------------------------------------------------------------- DRVSR

def _np_forward_warp_scaled(im, uv, oh, ow):
    """Bilinear forward splat with the reference's out/in coordinate
    scaling (SPMC upscale-while-warp, videosr_ops.py:399-503)."""
    b, h, w, c = im.shape
    sy, sx = oh / h, ow / w
    out = np.zeros((b, oh, ow, c))
    for bi in range(b):
        for r in range(h):
            for cc in range(w):
                # quirk preserved: x scaled by the HEIGHT ratio, y by width
                x = (cc + uv[bi, r, cc, 0]) * sy
                y = (r + uv[bi, r, cc, 1]) * sx
                x0, y0 = int(np.floor(x)), int(np.floor(y))
                for (yy, xx, wgt) in (
                    (y0, x0, (x0 + 1 - x) * (y0 + 1 - y)),
                    (y0 + 1, x0, (x0 + 1 - x) * (y - y0)),
                    (y0, x0 + 1, (x - x0) * (y0 + 1 - y)),
                    (y0 + 1, x0 + 1, (x - x0) * (y - y0)),
                ):
                    out[bi, min(max(yy, 0), oh - 1),
                        min(max(xx, 0), ow - 1)] += wgt * im[bi, r, cc]
    return out


def _sig(x):
    return 1.0 / (1.0 + np.exp(-x))


def drvsr_oracle(x, p, t=3, scale=4):
    """Reference DRVSR forward (model/drvsr.py:104-205) in numpy: EASYFLOW
    -> SPMC HR splat -> encoder / ConvLSTM / decoder with skips, per-frame
    outputs + bicubic-Y."""
    n, _, h, w, _ = x.shape
    oh, ow = h * scale, w * scale
    idx0 = t // 2
    y = _np_rgb2y(x)
    ref = y[:, idx0]
    bic = np_resize_tf1(ref, oh, ow, method="bicubic")
    flat = y.reshape(n * t, h, w, 1)
    ref_rep = np.repeat(y[:, idx0:idx0 + 1], t, 1).reshape(n * t, h, w, 1)
    uv = np_easyflow(flat, ref_rep, p)
    whr = _np_forward_warp_scaled(flat, uv, oh, ow).reshape(n, t, oh, ow, 1)

    cst = np.zeros((n, oh // 4, ow // 4, 128))
    hst = np.zeros_like(cst)
    outs = []
    for i in range(t):
        c1 = np.maximum(np_conv2d(whr[:, i], p["e1k"], p["e1b"]), 0)
        c2 = np.maximum(np_conv2d_s2(c1, p["e2k"], p["e2b"]), 0)
        c21 = np.maximum(np_conv2d(c2, p["e21k"], p["e21b"]), 0)
        c3 = np.maximum(np_conv2d_s2(c21, p["e3k"], p["e3b"]), 0)
        gates = np_conv2d(np.concatenate([c3, hst], -1), p["gk"], p["gb"])
        gi, gj, gf, go = np.split(gates, 4, axis=-1)
        cst = cst * _sig(gf + 1.0) + _sig(gi) * np.tanh(gj)
        hst = np.tanh(cst) * _sig(go)
        c31 = np.maximum(np_conv2d(hst, p["e31k"], p["e31b"]), 0)
        d1 = np.maximum(np_conv2d_transpose_tf(c31, p["d1k"], p["d1b"], 2), 0)
        d11 = np.maximum(np_conv2d(d1 + c21, p["d11k"], p["d11b"]), 0)
        d2 = np.maximum(np_conv2d_transpose_tf(d11, p["d2k"], p["d2b"], 2), 0)
        d21 = np.maximum(np_conv2d(d2 + c1, p["d21k"], p["d21b"]), 0)
        outs.append(np_conv2d(d21, p["d3k"], p["d3b"]))
    return np.stack(outs, 1) + bic[:, None]


def test_drvsr_golden_numpy():
    from pfnl_tpu.models.drvsr import DRVSR

    rng = np.random.default_rng(17)
    t, h, w = 3, 8, 8
    x = rng.random((1, t, h, w, 3))

    def W(*shape, s=0.1):
        return rng.standard_normal(shape) * s

    p = dict(
        c1k=W(5, 5, 2, 24), c1b=W(24), c2k=W(3, 3, 24, 24), c2b=W(24),
        c3k=W(5, 5, 24, 24), c3b=W(24), c4k=W(3, 3, 24, 24), c4b=W(24),
        c5k=W(3, 3, 24, 32), c5b=W(32),
        s1k=W(5, 5, 5, 24), s1b=W(24), s2k=W(3, 3, 24, 24), s2b=W(24),
        s3k=W(3, 3, 24, 24), s3b=W(24), s4k=W(3, 3, 24, 24), s4b=W(24),
        s5k=W(3, 3, 24, 8), s5b=W(8),
        e1k=W(5, 5, 1, 32), e1b=W(32), e2k=W(3, 3, 32, 64), e2b=W(64),
        e21k=W(3, 3, 64, 64), e21b=W(64), e3k=W(3, 3, 64, 128), e3b=W(128),
        gk=W(3, 3, 256, 512, s=0.05), gb=W(512),
        e31k=W(3, 3, 128, 128), e31b=W(128),
        d1k=W(4, 4, 64, 128), d1b=W(64),     # TF layout [kh,kw,OUT,IN]
        d11k=W(3, 3, 64, 64), d11b=W(64),
        d2k=W(4, 4, 32, 64), d2b=W(32),
        d21k=W(3, 3, 32, 32), d21b=W(32),
        d3k=W(5, 5, 32, 1), d3b=W(1),
    )

    want = drvsr_oracle(x, p)

    model = DRVSR(num_frames=t)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x, jnp.float32))
    params = variables["params"]
    ef = params["easyflow"]
    for name in ("c1", "c2", "c3", "c4", "c5", "s1", "s2", "s3", "s4", "s5"):
        ef[name] = {"kernel": p[name + "k"], "bias": p[name + "b"]}
    sm = params["srmodel"]
    for fl, kk in (("enc1", "e1"), ("enc2", "e2"), ("enc2_1", "e21"),
                   ("enc3", "e3"), ("enc3_1", "e31"), ("dec1_1", "d11"),
                   ("dec2_1", "d21"), ("dec3", "d3")):
        sm[fl] = {"kernel": p[kk + "k"], "bias": p[kk + "b"]}
    sm["lstm"]["gates"] = {"kernel": p["gk"], "bias": p["gb"]}
    # TF conv2d_transpose -> flax ConvTranspose: mirror + in/out transpose
    for fl, kk in (("dec1", "d1"), ("dec2", "d2")):
        sm[fl] = {"kernel": p[kk + "k"][::-1, ::-1].transpose(0, 1, 3, 2),
                  "bias": p[kk + "b"]}
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), params)

    got = np.asarray(model.apply({"params": params},
                                 jnp.asarray(x, jnp.float32))["sr"])
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)
