"""FlowNet-S / FlowNet-C ports (reference modules/model_flownet.py:10-240).

These are DORMANT in the reference's main training paths — imported via
`*` but never instantiated (SURVEY.md C11); only EasyFlow is used.  They
are provided for API-surface completeness: encoder/decoder flow nets with
multi-scale prediction and the x20 flow scaling of the original Caffe
models, plus the warp-confidence head (model_flownet.py:84-113) and the
correlation layer of FlowNet-C (model_flownet.py:217-240).

The reference's Caffe-weight loaders are replaced by the generic hdf5
importer (pfnl_tpu.utils.param_io).
"""

import jax
import jax.numpy as jnp
import flax.linen as nn

from pfnl_tpu.models.blocks import leaky_relu
from pfnl_tpu.ops.resize import resize_bilinear
from pfnl_tpu.ops.warp import backward_warp


def _conv(feats, k, s, name):
    return nn.Conv(feats, (k, k), strides=(s, s), padding="SAME", name=name)


def _deconv(feats, name):
    return nn.ConvTranspose(feats, (4, 4), strides=(2, 2), padding="SAME", name=name)


class FlowNetS(nn.Module):
    """FlowNet-Simple: 6-level encoder, refinement decoder, multi-scale
    flow heads, final x20-scaled full-res flow."""

    flow_scale: float = 20.0

    @nn.compact
    def __call__(self, img0, img1):
        n, h, w, c = img0.shape
        act = leaky_relu
        x = jnp.concatenate([img0, img1], axis=-1)

        c1 = act(_conv(64, 7, 2, "conv1")(x))
        c2 = act(_conv(128, 5, 2, "conv2")(c1))
        c3 = act(_conv(256, 5, 2, "conv3")(c2))
        c3_1 = act(_conv(256, 3, 1, "conv3_1")(c3))
        c4 = act(_conv(512, 3, 2, "conv4")(c3_1))
        c4_1 = act(_conv(512, 3, 1, "conv4_1")(c4))
        c5 = act(_conv(512, 3, 2, "conv5")(c4_1))
        c5_1 = act(_conv(512, 3, 1, "conv5_1")(c5))
        c6 = act(_conv(1024, 3, 2, "conv6")(c5_1))
        c6_1 = act(_conv(1024, 3, 1, "conv6_1")(c6))

        flow6 = _conv(2, 3, 1, "predict_flow6")(c6_1)
        up5 = act(_deconv(512, "deconv5")(c6_1))
        upf6 = _deconv(2, "upsample_flow6")(flow6)
        cat5 = jnp.concatenate([c5_1, up5, upf6], axis=-1)

        flow5 = _conv(2, 3, 1, "predict_flow5")(cat5)
        up4 = act(_deconv(256, "deconv4")(cat5))
        upf5 = _deconv(2, "upsample_flow5")(flow5)
        cat4 = jnp.concatenate([c4_1, up4, upf5], axis=-1)

        flow4 = _conv(2, 3, 1, "predict_flow4")(cat4)
        up3 = act(_deconv(128, "deconv3")(cat4))
        upf4 = _deconv(2, "upsample_flow4")(flow4)
        cat3 = jnp.concatenate([c3_1, up3, upf4], axis=-1)

        flow3 = _conv(2, 3, 1, "predict_flow3")(cat3)
        up2 = act(_deconv(64, "deconv2")(cat3))
        upf3 = _deconv(2, "upsample_flow3")(flow3)
        cat2 = jnp.concatenate([c2, up2, upf3], axis=-1)

        flow2 = _conv(2, 3, 1, "predict_flow2")(cat2)
        flow = resize_bilinear(flow2, (h, w)) * self.flow_scale
        return flow


class WarpConfidence(nn.Module):
    """uv_conf warp-confidence net (model_flownet.py:84-113): predicts a
    per-pixel confidence for a flow field from (img0, warped img1, flow)."""

    @nn.compact
    def __call__(self, img0, img1, uv):
        warped = backward_warp(img1, uv)
        x = jnp.concatenate([img0, warped, uv], axis=-1)
        act = leaky_relu
        x = act(_conv(32, 7, 1, "conf1")(x))
        x = act(_conv(64, 5, 1, "conf2")(x))
        x = act(_conv(32, 3, 1, "conf3")(x))
        return nn.sigmoid(_conv(1, 3, 1, "conf_out")(x))


def correlation(a: jax.Array, b: jax.Array, max_disp: int = 10, stride: int = 1):
    """FlowNet-C correlation layer (model_flownet.py:217-240): cosine-free
    dot-product correlation of feature maps over a (2d+1)^2 displacement
    window.  Returns [N, H, W, (2d+1)^2]."""
    n, h, w, c = a.shape
    d = max_disp
    pads = jnp.pad(b, ((0, 0), (d, d), (d, d), (0, 0)))
    outs = []
    for dy in range(0, 2 * d + 1, stride):
        for dx in range(0, 2 * d + 1, stride):
            shifted = jax.lax.dynamic_slice(pads, (0, dy, dx, 0), (n, h, w, c))
            outs.append(jnp.mean(a * shifted, axis=-1))
    return jnp.stack(outs, axis=-1)


class FlowNetC(nn.Module):
    """FlowNet-Correlation: siamese encoders, correlation layer, then the
    FlowNet-S style decoder trunk."""

    flow_scale: float = 20.0
    max_disp: int = 10

    @nn.compact
    def __call__(self, img0, img1):
        n, h, w, c = img0.shape
        act = leaky_relu
        # siamese encoder with SHARED weights: one conv stack applied twice
        conv1 = _conv(64, 7, 2, "conv1")
        conv2 = _conv(128, 5, 2, "conv2")
        conv3 = _conv(256, 5, 2, "conv3")
        enc = lambda x: act(conv3(act(conv2(act(conv1(x))))))
        fa = enc(img0)
        fb = enc(img1)
        corr = leaky_relu(correlation(fa, fb, self.max_disp, 2), 0.1)
        redir = act(_conv(32, 1, 1, "conv_redir")(fa))
        x = jnp.concatenate([corr, redir], axis=-1)
        x = act(_conv(256, 3, 1, "conv3_1")(x))
        c4 = act(_conv(512, 3, 2, "conv4")(x))
        c4_1 = act(_conv(512, 3, 1, "conv4_1")(c4))
        flow4 = _conv(2, 3, 1, "predict_flow4")(c4_1)
        up3 = act(_deconv(128, "deconv3")(c4_1))
        upf4 = _deconv(2, "upsample_flow4")(flow4)
        cat3 = jnp.concatenate([x, up3, upf4], axis=-1)
        flow3 = _conv(2, 3, 1, "predict_flow3")(cat3)
        flow = resize_bilinear(flow3, (h, w)) * self.flow_scale
        return flow
