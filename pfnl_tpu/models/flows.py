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

import jax
import jax.numpy as jnp
import flax.linen as nn

from pfnl_tpu.models.blocks import ConvParams, leaky_relu, xavier_uniform
from pfnl_tpu.ops.packed_conv import conv_down2_packed, conv_s1_packed
from pfnl_tpu.ops.shuffle import depth_to_space, space_to_depth
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
    """Coarse (x4-subpixel) + refinement (x2-subpixel) flow estimator.

    impl="packed" executes the 24-channel conv towers on the
    space_to_depth(2) layout (exact kernel rewrites, ops/packed_conv.py):
    at LR frame sizes the towers are lane-starved on the 128-lane MXU
    (24 of 128 lanes live).  Identical function space and param tree —
    "auto" = packed on TPU when h, w are multiples of 4.
    """

    dtype: jnp.dtype = jnp.float32
    impl: str = "auto"  # "auto" | "plain" | "packed"

    @nn.compact
    def __call__(self, imga, imgb):
        n, h, w, c = imga.shape
        relu = nn.relu
        dt = self.dtype
        inputs = jnp.concatenate([imga, imgb], axis=-1).astype(dt)

        impl = self.impl
        if impl == "auto":
            impl = ("packed"
                    if jax.default_backend() == "tpu" and h % 4 == 0
                    and w % 4 == 0 else "plain")
        if impl not in ("plain", "packed"):
            raise ValueError(f"unknown EasyFlow impl {self.impl!r}")
        if impl == "packed" and (h % 4 or w % 4):
            raise ValueError(f"impl='packed' needs h,w % 4 == 0, got {h}x{w}")

        p = lambda name, k, ci, co: ConvParams((k, k, ci, co),
                                               xavier_uniform(), name=name)()
        k_c1 = p("c1", 5, 2 * c, 24)
        k_c2 = p("c2", 3, 24, 24)
        k_c3 = p("c3", 5, 24, 24)
        k_c4 = p("c4", 3, 24, 24)
        k_c5 = p("c5", 3, 24, 32)
        k_s1 = p("s1", 5, 2 * c + 3, 24)
        k_s2 = p("s2", 3, 24, 24)
        k_s3 = p("s3", 3, 24, 24)
        k_s4 = p("s4", 3, 24, 24)
        k_s5 = p("s5", 3, 24, 8)

        def plain(x, kb, stride=1):
            k, b = kb
            o = jax.lax.conv_general_dilated(
                x, k.astype(dt), (stride, stride), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return o + b.astype(dt)

        if impl == "packed":
            xp = space_to_depth(inputs, 2)                     # [n,h/2,w/2,4*2c]
            c1 = relu(conv_down2_packed(xp, k_c1[0], k_c1[1]))
            c1p = space_to_depth(c1, 2)                        # [n,h/4,w/4,96]
            c2p = relu(conv_s1_packed(c1p, k_c2[0], k_c2[1]))
            c3 = relu(conv_down2_packed(c2p, k_c3[0], k_c3[1]))
            # h/4 x w/4 can be odd (45x80 at 180x320): c4/c5 stay plain —
            # they carry ~8% of the tower FLOPs
            c4 = relu(plain(c3, k_c4))
            c5 = jnp.tanh(plain(c4, k_c5))                     # [n,h/4,w/4,32]
        else:
            c1 = relu(plain(inputs, k_c1, stride=2))
            c2 = relu(plain(c1, k_c2))
            c3 = relu(plain(c2, k_c3, stride=2))
            c4 = relu(plain(c3, k_c4))
            c5 = jnp.tanh(plain(c4, k_c5))                     # [n,h/4,w/4,32]

        # sub-pixel reassembly to full-res flow: 32 = (2, 4, 4) = (uv, dy, dx)
        # (reference model_easyflow.py:87-89 reshape/transpose order)
        c5_hr = c5.reshape(n, h // 4, w // 4, 2, 4, 4)
        c5_hr = c5_hr.transpose(0, 1, 4, 2, 5, 3)
        c5_hr = c5_hr.reshape(n, h, w, 2)

        # coarse flow is tanh-bounded (|uv| < 1): gather-free local warp
        img_warp = backward_warp_local(imgb, c5_hr, max_disp=1)
        c5_pack = jnp.concatenate([inputs, c5_hr, img_warp], axis=-1)

        if impl == "packed":
            sp = space_to_depth(c5_pack, 2)                    # [n,h/2,w/2,4*(2c+3)]
            s1 = relu(conv_down2_packed(sp, k_s1[0], k_s1[1]))
            s1p = space_to_depth(s1, 2)                        # [n,h/4,w/4,96]
            s2p = relu(conv_s1_packed(s1p, k_s2[0], k_s2[1]))
            s3p = relu(conv_s1_packed(s2p, k_s3[0], k_s3[1]))
            s4p = relu(conv_s1_packed(s3p, k_s4[0], k_s4[1]))
            s5p = jnp.tanh(conv_s1_packed(s4p, k_s5[0], k_s5[1]))
            s5 = depth_to_space(s5p, 2)                        # [n,h/2,w/2,8]
        else:
            s1 = relu(plain(c5_pack, k_s1, stride=2))
            s2 = relu(plain(s1, k_s2))
            s3 = relu(plain(s2, k_s3))
            s4 = relu(plain(s3, k_s4))
            s5 = jnp.tanh(plain(s4, k_s5))                     # [n,h/2,w/2,8]

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
    """LTDVSR's pooled flow net (model/ltdvsr.py:136-149).

    impl="packed" runs the 9x9 32-channel conv towers on the
    space_to_depth(2) layout (exact rewrites, ops/packed_conv.py — 32 of
    128 MXU lanes live on the plain layout), and the 2x2/s2 max-pools
    become a max over the 4 block phases of the packed conv output
    (identical by definition of the packing).  Same function space and
    param tree; "auto" = packed on TPU when h, w are multiples of 4.
    """

    dtype: jnp.dtype = jnp.float32
    impl: str = "auto"  # "auto" | "plain" | "packed"

    @nn.compact
    def __call__(self, source, reference):
        n, h, w, c = reference.shape
        dt = self.dtype
        x = jnp.concatenate([reference, source], axis=-1).astype(dt)

        impl = self.impl
        if impl == "auto":
            impl = ("packed"
                    if jax.default_backend() == "tpu" and h % 4 == 0
                    and w % 4 == 0 else "plain")
        if impl not in ("plain", "packed"):
            raise ValueError(f"unknown LTDFlow impl {self.impl!r}")
        if impl == "packed" and (h % 4 or w % 4):
            raise ValueError(f"impl='packed' needs h,w % 4 == 0, got {h}x{w}")

        p = lambda name, k, ci, co: ConvParams((k, k, ci, co),
                                               xavier_uniform(), name=name)()
        k0 = p("conv0", 9, 2 * c, 32)
        k1 = p("conv1", 9, 32, 32)
        k2 = p("conv2", 3, 32, 2)

        def plain(xx, kb):
            k, b = kb
            o = jax.lax.conv_general_dilated(
                xx, k.astype(dt), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return o + b.astype(dt)

        if impl == "packed":
            def phase_max(xp, co):
                # max over the 4 s2d(2) block phases == max_pool 2x2/s2
                m, hh, ww, _ = xp.shape
                return jnp.max(xp.reshape(m, hh, ww, 4, co), axis=3)

            xp = space_to_depth(x, 2)                       # [n,h/2,w/2,8]
            x = phase_max(
                nn.relu(conv_s1_packed(xp, k0[0], k0[1])), 32)
            xp = space_to_depth(x, 2)                       # [n,h/4,w/4,128]
            x = phase_max(
                nn.relu(conv_s1_packed(xp, k1[0], k1[1])), 32)
        else:
            x = nn.relu(plain(x, k0))
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = nn.relu(plain(x, k1))
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = resize_bilinear(x, (h, w))
        return jnp.tanh(plain(x, k2))
