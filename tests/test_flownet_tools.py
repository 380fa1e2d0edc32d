"""FlowNet-S/C ports, warp confidence, and flow tools."""

import numpy as np
import jax
import jax.numpy as jnp

from pfnl_tpu.models.flownet import FlowNetS, FlowNetC, WarpConfidence, correlation
from pfnl_tpu.utils.flow_tools import (
    read_flo,
    write_flo,
    flow_epe,
    flow_aae,
    flow_to_color,
)


from test_golden_models import np_conv2d, np_conv2d_transpose_tf, np_lrelu


def test_flownet_s_shapes_and_caffe_import(rng):
    """FlowNetS forward on a non-64-multiple input (exercises the adapt
    resize + rescale path) and a full Caffe-layout import: every leaf of
    the param tree must be covered by the caffemodel name map."""
    from pfnl_tpu.utils.param_io import load_caffe_flownet

    model = FlowNetS()
    a = jnp.asarray(rng.random((1, 48, 48, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), a, a)
    uv = model.apply(variables, a, a)
    assert uv.shape == (1, 48, 48, 2)
    assert np.all(np.isfinite(np.asarray(uv)))

    caffe = _caffe_flownet_weights(rng, variant="s")
    new = load_caffe_flownet(variables["params"], caffe, verbose=False)
    n_leaves = len(jax.tree_util.tree_leaves(variables["params"]))
    assert n_leaves == 2 * len(caffe)
    # every leaf must have been replaced by an imported blob
    changed = jax.tree_util.tree_map(
        lambda a, b: not np.array_equal(np.asarray(a), np.asarray(b)),
        variables["params"], new)
    assert all(jax.tree_util.tree_leaves(changed))
    # spot-check the conv layout perm [2,3,1,0] (modules/utils.py:9)
    np.testing.assert_allclose(
        np.asarray(new["conv1"]["kernel"]),
        caffe["conv1"][0].transpose(2, 3, 1, 0))


def test_correlation_matches_reference_normalization(rng):
    """layer_corr (model_flownet.py:217-240): channel SUM divided by the
    number of displacements."""
    a = jnp.asarray(rng.random((1, 8, 8, 4)).astype(np.float32))
    b = jnp.asarray(rng.random((1, 8, 8, 4)).astype(np.float32))
    corr = np.asarray(correlation(a, b, max_disp=2, stride=1))
    assert corr.shape == (1, 8, 8, 25)
    center = np.asarray(jnp.sum(a * b, axis=-1)) / 25.0
    np.testing.assert_allclose(corr[..., 12], center, atol=1e-6)


def test_warp_confidence(rng):
    """uv_conf (model_flownet.py:84-113): cosine-similarity output in
    [0, 1], shared stack over the batch-stacked pair."""
    model = WarpConfidence()
    img = jnp.asarray(rng.random((2, 16, 16, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), img, img)
    conf = np.asarray(model.apply(variables, img, img))
    assert conf.shape == (2, 16, 16, 1)
    assert np.all((conf >= -1e-5) & (conf <= 1 + 1e-5))
    # identical inputs -> cosine 1 -> confidence 1
    np.testing.assert_allclose(conf, 1.0, atol=1e-5)


# ------------------------------------------------- FlowNet-C numpy oracle

_FNC_CONVS = {
    # name: (k, cin, cout, stride)   stride-2 == stride-1 then [0::2]
    "conv1": (7, 3, 64, 2),
    "conv2": (5, 64, 128, 2),
    "conv3": (5, 128, 256, 2),
    "conv_redir": (1, 256, 32, 1),
    "conv3_1": (3, 473, 256, 1),
    "conv4": (3, 256, 512, 2),
    "conv4_1": (3, 512, 512, 1),
    "conv5": (3, 512, 512, 2),
    "conv5_1": (3, 512, 512, 1),
    "conv6": (3, 512, 1024, 2),
    "conv6_1": (3, 1024, 1024, 1),
}

_FN_DECODER = [
    # (caffe name, kind, cin, cout)
    ("Convolution1", "conv", 1024, 2),
    ("deconv5", "deconv", 1024, 512),
    ("upsample_flow6to5", "deconv", 2, 2),
    ("Convolution2", "conv", 1026, 2),
    ("deconv4", "deconv", 1026, 256),
    ("upsample_flow5to4", "deconv", 2, 2),
    ("Convolution3", "conv", 770, 2),
    ("deconv3", "deconv", 770, 128),
    ("upsample_flow4to3", "deconv", 2, 2),
    ("Convolution4", "conv", 386, 2),
    ("deconv2", "deconv", 386, 64),
    ("upsample_flow3to2", "deconv", 2, 2),
    ("Convolution5", "conv", 194, 2),
]


def _caffe_flownet_weights(rng, variant):
    """Random weights in CAFFE blob layouts (conv [out,in,kh,kw],
    deconv [in,out,kh,kw])."""
    w = {}
    if variant == "c":
        convs = _FNC_CONVS
    else:
        convs = dict(_FNC_CONVS)
        del convs["conv_redir"]
        convs["conv1"] = (7, 6, 64, 2)
        convs["conv3_1"] = (3, 256, 256, 1)
    for name, (k, cin, cout, _) in convs.items():
        w[name] = (rng.standard_normal((cout, cin, k, k)).astype(np.float32)
                   * (0.5 / np.sqrt(k * k * cin)),
                   0.1 * rng.standard_normal((cout,)).astype(np.float32))
    for name, kind, cin, cout in _FN_DECODER:
        # concat widths are identical for the S and C variants
        if kind == "conv":
            shape = (cout, cin, 3, 3)
        else:
            shape = (cin, cout, 4, 4)
        w[name] = (rng.standard_normal(shape).astype(np.float32)
                   * (0.5 / np.sqrt(9 * cin)),
                   0.1 * rng.standard_normal((cout,)).astype(np.float32))
    return w


def _np_resize_align_corners(x, oh, ow):
    """Bilinear align_corners=True resize (TF1 semantics)."""
    def mat(n_in, n_out):
        src = np.arange(n_out) * ((n_in - 1) / max(n_out - 1, 1))
        base = np.floor(src).astype(int)
        m = np.zeros((n_out, n_in))
        for t in (0, 1):
            idx = np.clip(base + t, 0, n_in - 1)
            wg = np.maximum(0, 1 - np.abs(src - (base + t)))
            for o in range(n_out):
                m[o, idx[o]] += wg[o]
        return m

    n, h, w, c = x.shape
    return np.einsum("oh,nhwc,pw->nopc", mat(h, oh), x, mat(w, ow))


def _np_corr(a, b, max_disp=20, stride=2):
    n, h, w, c = a.shape
    d = max_disp
    bp = np.pad(b, ((0, 0), (d, d), (d, d), (0, 0)))
    outs = []
    for dy in range(0, 2 * d + stride, stride):
        for dx in range(0, 2 * d + stride, stride):
            outs.append(np.sum(a * bp[:, dy:dy + h, dx:dx + w, :], axis=-1))
    nd = len(range(-d, d + stride, stride))
    return np.stack(outs, axis=-1) / (nd * nd)


def flownetc_oracle(img0, img1, caffe):
    """Reference FLOWNETC.forward (model_flownet.py:242-313) in numpy
    float64, consuming CAFFE-layout weights, with the two latent bugs
    fixed the same way as the flax port (siamese batch-stack intent,
    FlowNet-S-style concat2)."""
    def cw(name):
        W, b = caffe[name]
        return W.transpose(2, 3, 1, 0).astype(np.float64), b
    def dw(name):
        W, b = caffe[name]  # [in,out,kh,kw] -> TF deconv [kh,kw,out,in]
        return W.transpose(2, 3, 1, 0).astype(np.float64), b

    def conv(x, name, act=True):
        k, cin, cout, stride = _FNC_CONVS.get(name, (3, 0, 2, 1))
        W, b = cw(name)
        y = np_conv2d(x, W, b)
        if stride == 2:
            y = y[:, 0::2, 0::2, :]
        return np_lrelu(y, 0.1) if act else y

    def deconv(x, name, act):
        W, b = dw(name)
        y = np_conv2d_transpose_tf(x, W, b, 2)
        return np_lrelu(y, 0.1) if act else y

    n, h, w, c = img0.shape
    x = np.concatenate([img0, img1], axis=-1).astype(np.float64)
    x = x - x.mean(axis=(1, 2), keepdims=True)
    ah, aw = -(-h // 64) * 64, -(-w // 64) * 64
    if (ah, aw) != (h, w):
        x = _np_resize_align_corners(x, ah, aw)
    xa, xb = x[..., :c], x[..., c:]

    c2a = conv(conv(xa, "conv1"), "conv2")
    c2b = conv(conv(xb, "conv1"), "conv2")
    fa, fb = conv(c2a, "conv3"), conv(c2b, "conv3")
    corr = _np_corr(fa, fb)
    redir = conv(fa, "conv_redir")
    c3_1 = conv(np.concatenate([redir, corr], axis=-1), "conv3_1")
    c4_1 = conv(conv(c3_1, "conv4"), "conv4_1")
    c5_1 = conv(conv(c4_1, "conv5"), "conv5_1")
    c6_1 = conv(conv(c5_1, "conv6"), "conv6_1")

    flow6 = conv(c6_1, "Convolution1", act=False)
    cat5 = np.concatenate([c5_1, deconv(c6_1, "deconv5", True),
                           deconv(flow6, "upsample_flow6to5", False)], -1)
    flow5 = conv(cat5, "Convolution2", act=False)
    cat4 = np.concatenate([c4_1, deconv(cat5, "deconv4", True),
                           deconv(flow5, "upsample_flow5to4", False)], -1)
    flow4 = conv(cat4, "Convolution3", act=False)
    cat3 = np.concatenate([c3_1, deconv(cat4, "deconv3", True),
                           deconv(flow4, "upsample_flow4to3", False)], -1)
    flow3 = conv(cat3, "Convolution4", act=False)
    cat2 = np.concatenate([c2a, deconv(cat3, "deconv2", True),
                           deconv(flow3, "upsample_flow3to2", False)], -1)
    flow2 = conv(cat2, "Convolution5", act=False)

    flow = _np_resize_align_corners(flow2 * 20.0, h, w)
    return flow * np.array([w / aw, h / ah]).reshape(1, 1, 1, 2)


def test_flownetc_golden_caffe_import(rng):
    """Full-depth FlowNetC forward under imported Caffe-layout weights
    == the numpy oracle of the reference graph (48x48 input exercises
    the adapt resize, the rescale coefficients, and every decoder
    level)."""
    from pfnl_tpu.utils.param_io import load_caffe_flownet

    caffe = _caffe_flownet_weights(rng, variant="c")
    img0 = rng.random((1, 48, 48, 3)).astype(np.float32)
    img1 = rng.random((1, 48, 48, 3)).astype(np.float32)

    model = FlowNetC()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(img0), jnp.asarray(img1))
    params = load_caffe_flownet(variables["params"], caffe, verbose=False)
    n_leaves = len(jax.tree_util.tree_leaves(params))
    assert n_leaves == 2 * len(caffe)

    got = np.asarray(model.apply({"params": params},
                                 jnp.asarray(img0), jnp.asarray(img1)))
    ref = flownetc_oracle(img0, img1, caffe)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_flo_roundtrip(tmp_path, rng):
    flow = rng.standard_normal((6, 8, 2)).astype(np.float32)
    p = str(tmp_path / "a.flo")
    write_flo(p, flow)
    np.testing.assert_array_equal(read_flo(p), flow)


def test_flow_metrics():
    gt = np.ones((4, 4, 2), np.float32)
    assert flow_epe(gt, gt) == 0.0
    assert flow_aae(gt, gt) == 0.0
    off = gt + np.array([1.0, 0.0])
    assert flow_epe(off, gt) == 1.0


def test_flow_to_color(rng):
    flow = rng.standard_normal((10, 12, 2)).astype(np.float32)
    img = flow_to_color(flow)
    assert img.shape == (10, 12, 3) and img.dtype == np.uint8
    # zero flow with max_flow set is near-white (rad=0 -> 1-0*(1-col))
    white = flow_to_color(np.zeros((4, 4, 2), np.float32), max_flow=1.0)
    assert np.all(white >= 250)
