"""FlowNet-S / FlowNet-C ports (reference modules/model_flownet.py:10-335).

These are DORMANT in the reference's main training paths — imported via
`*` but never instantiated (SURVEY.md C11); only EasyFlow is used.  They
are provided for API-surface completeness at the reference's full depth:

  * shared pre/post processing (model_flownet.py:23-31,79-81,244-252,
    310-312): per-image mean subtraction, bilinear align_corners resize
    to the next multiple of 64, and the final x20-scaled flow resized
    back with per-axis rescale coefficients;
  * 6-level encoders whose strided stages replicate the reference's
    `stride-1 conv then [:, 0::2, 0::2]` sampling exactly (a stride-2
    conv with symmetric k//2 padding — NOT TF-"SAME" stride-2 padding,
    which is asymmetric and one pixel off);
  * the full refinement decoder with multi-scale flow heads
    (flow6..flow2, model_flownet.py:50-78,281-309);
  * FlowNet-C's correlation layer (model_flownet.py:217-240) and the
    warp-confidence net `uv_conf` (model_flownet.py:84-113).

Two latent bugs in the reference's FLOWNETC.forward (it is dead code
there and cannot run as written) are consciously fixed rather than
replicated: the no-op channel re-concat at model_flownet.py:254 (the
conv3a/conv3b batch split at :265-266 shows the intent is a siamese
encoder over a batch-stacked pair), and the swapped `tf.concat`
arguments at :306 (concat2 follows the FlowNet-S pattern at :75).

Caffe-layout weight import lives in pfnl_tpu.utils.param_io
(`load_caffe_flownet`), replacing the pycaffe-object loaders at
modules/utils.py:4-17.
"""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from pfnl_tpu.models.blocks import leaky_relu as _lrelu
from pfnl_tpu.ops.resize import resize_bilinear


def _act(x):
    """FlowNet activation: videosr_ops.py:40 leaky_relu alpha=0.1 (the
    arg_scope activation at model_flownet.py:33-36)."""
    return _lrelu(x, 0.1)


def _conv(feats, k, name):
    return nn.Conv(feats, (k, k), padding="SAME", name=name)


def _sconv(feats, k, name):
    """Stride-2 conv == reference `slim.conv2d(stride=1)[:, 0::2, 0::2]`
    (model_flownet.py:38-40): symmetric k//2 padding keeps output pixel i
    centred on input pixel 2i."""
    p = k // 2
    return nn.Conv(feats, (k, k), strides=(2, 2), padding=((p, p), (p, p)),
                   name=name)


def _deconv(feats, name):
    return nn.ConvTranspose(feats, (4, 4), strides=(2, 2), padding="SAME",
                            name=name)


def _adapt(x):
    """Mean-subtract and resize to the next multiple of 64
    (model_flownet.py:23-31).  Returns (adapted, (sx, sy)) where s* are
    the final per-axis flow rescale coefficients."""
    n, h, w, c = x.shape
    ah, aw = -(-h // 64) * 64, -(-w // 64) * 64
    x = x - jnp.mean(x, axis=(1, 2), keepdims=True)
    if (ah, aw) != (h, w):
        x = resize_bilinear(x, (ah, aw), mapping="align_corners")
    return x, (w / aw, h / ah)


def _unadapt(flow2, h, w, scale_xy, flow_scale):
    """x20 scale, align_corners resize to the caller's resolution, and
    per-axis rescale (model_flownet.py:78-81)."""
    flow = flow2 * flow_scale
    if flow.shape[1:3] != (h, w):
        flow = resize_bilinear(flow, (h, w), mapping="align_corners")
    return flow * jnp.asarray(scale_xy, flow.dtype).reshape(1, 1, 1, 2)


class _Decoder(nn.Module):
    """FlowNet refinement decoder (model_flownet.py:50-78): shared by
    the S and C variants from conv3_1 up."""

    @nn.compact
    def __call__(self, c2, c3_1, c4_1, c5_1, c6_1):
        act = _act
        flow6 = _conv(2, 3, "predict_flow6")(c6_1)
        up5 = act(_deconv(512, "deconv5")(c6_1))
        upf6 = _deconv(2, "upsample_flow6")(flow6)
        cat5 = jnp.concatenate([c5_1, up5, upf6], axis=-1)

        flow5 = _conv(2, 3, "predict_flow5")(cat5)
        up4 = act(_deconv(256, "deconv4")(cat5))
        upf5 = _deconv(2, "upsample_flow5")(flow5)
        cat4 = jnp.concatenate([c4_1, up4, upf5], axis=-1)

        flow4 = _conv(2, 3, "predict_flow4")(cat4)
        up3 = act(_deconv(128, "deconv3")(cat4))
        upf4 = _deconv(2, "upsample_flow4")(flow4)
        cat3 = jnp.concatenate([c3_1, up3, upf4], axis=-1)

        flow3 = _conv(2, 3, "predict_flow3")(cat3)
        up2 = act(_deconv(64, "deconv2")(cat3))
        upf3 = _deconv(2, "upsample_flow3")(flow3)
        cat2 = jnp.concatenate([c2, up2, upf3], axis=-1)

        return _conv(2, 3, "predict_flow2")(cat2)


class FlowNetS(nn.Module):
    """FlowNet-Simple (model_flownet.py:21-82): 6-level encoder over the
    channel-concatenated pair, refinement decoder, multi-scale flow
    heads, final x20-scaled full-res flow."""

    flow_scale: float = 20.0

    @nn.compact
    def __call__(self, img0, img1):
        n, h, w, c = img0.shape
        act = _act
        x, scale_xy = _adapt(jnp.concatenate([img0, img1], axis=-1))

        c1 = act(_sconv(64, 7, "conv1")(x))
        c2 = act(_sconv(128, 5, "conv2")(c1))
        c3 = act(_sconv(256, 5, "conv3")(c2))
        c3_1 = act(_conv(256, 3, "conv3_1")(c3))
        c4 = act(_sconv(512, 3, "conv4")(c3_1))
        c4_1 = act(_conv(512, 3, "conv4_1")(c4))
        c5 = act(_sconv(512, 3, "conv5")(c4_1))
        c5_1 = act(_conv(512, 3, "conv5_1")(c5))
        c6 = act(_sconv(1024, 3, "conv6")(c5_1))
        c6_1 = act(_conv(1024, 3, "conv6_1")(c6))

        flow2 = _Decoder(name="decoder")(c2, c3_1, c4_1, c5_1, c6_1)
        return _unadapt(flow2, h, w, scale_xy, self.flow_scale)


def correlation(a: jax.Array, b: jax.Array, max_disp: int = 20,
                stride: int = 2):
    """FlowNet-C correlation layer (model_flownet.py:217-240): per-pixel
    dot products of feature maps over displacements
    dy,dx in {-max_disp, ..., +max_disp} step `stride`, channel-summed
    and divided by the number of displacements (441 for the reference's
    max_disp=20/stride=2).  Returns [N, H, W, n_disp^2]."""
    n, h, w, c = a.shape
    d = max_disp
    nd = len(range(-d, d + stride, stride))
    pads = jnp.pad(b, ((0, 0), (d, d), (d, d), (0, 0)))
    outs = []
    for dy in range(0, 2 * d + stride, stride):
        for dx in range(0, 2 * d + stride, stride):
            shifted = jax.lax.dynamic_slice(pads, (0, dy, dx, 0),
                                            (n, h, w, c))
            outs.append(jnp.sum(a * shifted, axis=-1))
    return jnp.stack(outs, axis=-1) / (nd * nd)


class FlowNetC(nn.Module):
    """FlowNet-Correlation (model_flownet.py:242-313): siamese 3-level
    encoder (shared weights), correlation layer + redirect conv, then
    conv3_1..conv6_1 and the FlowNet-S refinement decoder."""

    flow_scale: float = 20.0
    max_disp: int = 20

    @nn.compact
    def __call__(self, img0, img1):
        n, h, w, c = img0.shape
        act = _act
        x, scale_xy = _adapt(jnp.concatenate([img0, img1], axis=-1))
        xa, xb = x[..., :c], x[..., c:]

        conv1 = _sconv(64, 7, "conv1")
        conv2 = _sconv(128, 5, "conv2")
        conv3 = _sconv(256, 5, "conv3")
        enc2 = lambda v: act(conv2(act(conv1(v))))
        c2a, c2b = enc2(xa), enc2(xb)
        fa, fb = act(conv3(c2a)), act(conv3(c2b))

        corr = correlation(fa, fb, self.max_disp, 2)
        redir = act(_conv(32, 1, "conv_redir")(fa))
        c3_1 = act(_conv(256, 3, "conv3_1")(
            jnp.concatenate([redir, corr], axis=-1)))

        c4 = act(_sconv(512, 3, "conv4")(c3_1))
        c4_1 = act(_conv(512, 3, "conv4_1")(c4))
        c5 = act(_sconv(512, 3, "conv5")(c4_1))
        c5_1 = act(_conv(512, 3, "conv5_1")(c5))
        c6 = act(_sconv(1024, 3, "conv6")(c5_1))
        c6_1 = act(_conv(1024, 3, "conv6_1")(c6))

        flow2 = _Decoder(name="decoder")(c2a, c3_1, c4_1, c5_1, c6_1)
        return _unadapt(flow2, h, w, scale_xy, self.flow_scale)


class WarpConfidence(nn.Module):
    """`uv_conf` warp-confidence net (model_flownet.py:84-113): both
    images are contrast-normalized, pushed through a shared 9-layer
    5x5-conv + BN stack, and scored by channelwise cosine similarity
    mapped to [0, 1].  `b` is the (already warped) comparison frame."""

    @nn.compact
    def __call__(self, a, b, train: bool = False):
        x = jnp.concatenate([a, b], axis=0)
        x = x - jnp.mean(x, axis=(1, 2), keepdims=True)
        x = x / jnp.mean(x * x, axis=(1, 2), keepdims=True)
        if x.shape[-1] == 1:
            x = jnp.tile(x, (1, 1, 1, 3))

        widths = [32, 32, 64, 64, 64, 64, 64, 64, 64]
        for i, wdt in enumerate(widths[:-1]):
            x = _conv(wdt, 5, f"conv{i + 1}")(x)
            x = nn.relu(nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-3,
                name=f"bn{i + 1}")(x))
        x = _conv(widths[-1], 5, "conv9")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, name="bn9")(x)

        na = x[:a.shape[0]]
        nb = x[a.shape[0]:]
        norm = lambda v: v * jax.lax.rsqrt(
            jnp.sum(v * v, axis=-1, keepdims=True) + 1e-12)
        cos = jnp.sum(norm(na) * norm(nb), axis=-1, keepdims=True)
        return (cos + 1.0) / 2.0
