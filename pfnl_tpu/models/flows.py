"""Flow-estimation subnetworks (L1).

  * EasyFlow — the coarse-to-fine two-stage flow net actually used by the
    motion-compensated models (reference modules/model_easyflow.py:64-106;
    instantiated at model/vespcn.py:49, model/mcresnet.py:49,
    model/drvsr.py:51).  Independently trainable — see
    pfnl_tpu.train.easyflow_trainer.
  * FRVSRFlow — FRVSR's inline 3-level conv U-net (model/frvsr.py:68-96).
  * LTDFlow — LTDVSR's inline pooled flow net (model/ltdvsr.py:136-149).

All consume a pair of images (channel-last, usually the Y channel) and
return flow [N,h,w,2] with (x=col, y=row) displacement channels.
"""

import functools

import jax.numpy as jnp
import flax.linen as nn

from pfnl_tpu.models.blocks import leaky_relu, xavier_uniform
from pfnl_tpu.ops.warp import backward_warp_local
from pfnl_tpu.ops.resize import resize_bilinear


def _conv(feats, k, name, stride=1, dtype=None):
    return nn.Conv(
        feats,
        (k, k),
        strides=(stride, stride),
        padding="SAME",
        kernel_init=xavier_uniform(),
        dtype=dtype,
        name=name,
    )


class EasyFlow(nn.Module):
    """Coarse (x4-subpixel) + refinement (x2-subpixel) flow estimator."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, imga, imgb):
        _conv_ = functools.partial(_conv, dtype=self.dtype)
        n, h, w, c = imga.shape
        relu = nn.relu
        inputs = jnp.concatenate([imga, imgb], axis=-1).astype(self.dtype)

        c1 = relu(_conv_(24, 5, "c1", stride=2)(inputs))
        c2 = relu(_conv_(24, 3, "c2")(c1))
        c3 = relu(_conv_(24, 5, "c3", stride=2)(c2))
        c4 = relu(_conv_(24, 3, "c4")(c3))
        c5 = jnp.tanh(_conv_(32, 3, "c5")(c4))  # [n, h/4, w/4, 32]

        # sub-pixel reassembly to full-res flow: 32 = (2, 4, 4) = (uv, dy, dx)
        # (reference model_easyflow.py:87-89 reshape/transpose order)
        c5_hr = c5.reshape(n, h // 4, w // 4, 2, 4, 4)
        c5_hr = c5_hr.transpose(0, 1, 4, 2, 5, 3)
        c5_hr = c5_hr.reshape(n, h, w, 2)

        # coarse flow is tanh-bounded (|uv| < 1): gather-free local warp
        img_warp = backward_warp_local(imgb, c5_hr, max_disp=1)
        c5_pack = jnp.concatenate([inputs, c5_hr, img_warp], axis=-1)

        s1 = relu(_conv_(24, 5, "s1", stride=2)(c5_pack))
        s2 = relu(_conv_(24, 3, "s2")(s1))
        s3 = relu(_conv_(24, 3, "s3")(s2))
        s4 = relu(_conv_(24, 3, "s4")(s3))
        s5 = jnp.tanh(_conv_(8, 3, "s5")(s4))  # [n, h/2, w/2, 8]

        s5_hr = s5.reshape(n, h // 2, w // 2, 2, 2, 2)
        s5_hr = s5_hr.transpose(0, 1, 4, 2, 5, 3)
        s5_hr = s5_hr.reshape(n, h, w, 2)
        return c5_hr + s5_hr


class FRVSRFlow(nn.Module):
    """FRVSR's 3-level encoder/decoder flow net with tanh output
    (model/frvsr.py:68-96).  Output flow is in [-1, 1] pixels."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, i_t, i_pt):
        _conv_ = functools.partial(_conv, dtype=self.dtype)
        n, h, w, c = i_t.shape
        x0 = jnp.concatenate([i_t, i_pt], axis=-1).astype(self.dtype)
        for p in range(3):
            for q in range(2):
                x0 = leaky_relu(_conv_(32 * (2**p), 3, f"conv0_{p}_{q}")(x0))
            x0 = nn.max_pool(x0, (2, 2), strides=(2, 2))
        h1, w1 = x0.shape[1], x0.shape[2]
        for p in range(3):
            for q in range(2):
                x0 = leaky_relu(_conv_(int(256 * (0.5**p)), 3, f"conv1_{p}_{q}")(x0))
            x0 = resize_bilinear(x0, (h1 * 2 ** (p + 1), w1 * 2 ** (p + 1)))
        if x0.shape[1] != h or x0.shape[2] != w:
            x0 = resize_bilinear(x0, (h, w))
        x0 = leaky_relu(_conv_(32, 3, "conv2")(x0))
        return jnp.tanh(_conv_(2, 3, "conv3")(x0))


class LTDFlow(nn.Module):
    """LTDVSR's pooled flow net (model/ltdvsr.py:136-149)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, source, reference):
        _conv_ = functools.partial(_conv, dtype=self.dtype)
        n, h, w, c = reference.shape
        x = jnp.concatenate([reference, source], axis=-1).astype(self.dtype)
        x = nn.relu(_conv_(32, 9, "conv0")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(_conv_(32, 9, "conv1")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = resize_bilinear(x, (h, w))
        return jnp.tanh(_conv_(2, 3, "conv2")(x))
