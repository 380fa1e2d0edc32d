"""MCResNet: EasyFlow motion compensation + deep residual CNN
(reference model/mcresnet.py:30-118).

Quirks preserved:
  * per-frame 5x5@64 encoders share weights by TEMPORAL DISTANCE
    |i - center| (model/mcresnet.py:96): enc1_0 for the center frame,
    enc1_1 for the +-1 frames, enc1_2 for the +-2 frames.
  * the 9-conv trunk's peculiar accumulation (model/mcresnet.py:100-105):
    every conv reads `merge`, and `merge` accumulates conv outputs from
    the second conv on; the head consumes the LAST conv output.

Output Y-channel only, same contract as VESPCN.

trunk_impl="packed" runs the encoders + 9-conv trunk + conv6 on the
space_to_depth(2) layout (exact kernel rewrites, ops/packed_conv.py):
the trunk's 32-channel 3x3 convs at LR size fill 32 of 128 MXU lanes.
Identical function space and param tree; "auto" = packed on TPU for
even LR sizes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from pfnl_tpu.models.blocks import ConvParams, PReLU, xavier_uniform
from pfnl_tpu.models.flows import EasyFlow
from pfnl_tpu.ops.color import rgb2y
from pfnl_tpu.ops.packed_conv import conv_s1_packed, pack_kernel_s1
from pfnl_tpu.ops.resize import resize_bicubic
from pfnl_tpu.ops.shuffle import depth_to_space, space_to_depth
from pfnl_tpu.ops.warp import forward_warp, forward_warp_local
from pfnl_tpu.ops.shuffle import pixel_shuffle_legacy


def _concat_perm(t: int, c: int) -> np.ndarray:
    """Input-channel permutation taking the packed enc2_0 kernel (rows
    ordered phase*T*C + f*C + c, i.e. s2d of the LOGICAL frame-concat)
    to the layout actually produced by concatenating per-frame packed
    encoder outputs (rows f*4*C + phase*C + c)."""
    j = np.arange(4 * t * c)
    f, r = j // (4 * c), j % (4 * c)
    ph, ch = r // c, r % c
    return ph * (t * c) + f * c + ch


class MCResNet(nn.Module):
    num_frames: int = 5
    scale: int = 4
    trunk_impl: str = "auto"  # "auto" | "plain" | "packed"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.flownet = EasyFlow(dtype=self.dtype, name="easyflow")
        conv = lambda co, k, ci, name: ConvParams((k, k, ci, co),
                                                  xavier_uniform(), name=name)
        radius = self.num_frames // 2
        self.enc1 = [conv(64, 5, 1, f"enc1_{d}") for d in range(radius + 1)]
        self.enc1_act = [PReLU(channels=64, name=f"enc1_prelu_{i}")
                         for i in range(self.num_frames)]
        cis = [64 * self.num_frames] + [32] * 8
        self.enc2 = [conv(32, 3, cis[i], f"enc2_{i}") for i in range(9)]
        self.enc2_act = [PReLU(channels=32, name=f"enc2_prelu_{i}")
                         for i in range(9)]
        self.conv6 = conv(16, 3, 32, "conv6")
        self.conv6_act = PReLU(channels=16, name="conv6_prelu")
        self.rnn_out = conv(4, 3, 4, "rnn_out")

    def __call__(self, frames_lr):
        n, t, h, w, c = frames_lr.shape
        out_h, out_w = h * self.scale, w * self.scale
        idx0 = t // 2
        dt = self.dtype
        frames_y = rgb2y(frames_lr.astype(dt))
        ref_y = frames_y[:, idx0]
        bic_ref = resize_bicubic(ref_y, (out_h, out_w))

        impl = self.trunk_impl
        if impl == "auto":
            impl = ("packed"
                    if jax.default_backend() == "tpu" and h % 2 == 0
                    and w % 2 == 0 else "plain")
        if impl not in ("plain", "packed"):
            raise ValueError(f"unknown MCResNet trunk_impl {self.trunk_impl!r}")
        if impl == "packed" and (h % 2 or w % 2):
            raise ValueError(f"trunk_impl='packed' needs even h,w, got {h}x{w}")
        packed = impl == "packed"

        flat = frames_y.reshape(n * t, h, w, 1)
        ref_rep = jnp.broadcast_to(ref_y[:, None], (n, t, h, w, 1)).reshape(n * t, h, w, 1)
        uv = self.flownet(flat, ref_rep)
        # EasyFlow = two tanh stages -> |uv| <= 2: scatter-free local splat
        warped = forward_warp_local(flat, uv, max_disp=2).reshape(n, t, h, w, 1)
        uv = uv.reshape(n, t, h, w, 2)

        def plain_conv(x, kb):
            k, b = kb()
            o = jax.lax.conv_general_dilated(
                x, k.astype(dt), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return o + b.astype(dt)

        if packed:
            # distance-shared encoders on the packed layout
            wp = space_to_depth(
                warped.reshape(n * t, h, w, 1), 2
            ).reshape(n, t, h // 2, w // 2, 4)
            enc = []
            for i in range(t):
                ke, be = self.enc1[abs(i - idx0)]()
                enc.append(self.enc1_act[i](
                    conv_s1_packed(wp[:, i], ke, be)))
            # concat of per-frame packed outputs: channel = f*256 + ph*64 + c;
            # fold the layout difference into the (compile-time) kernel
            # permutation instead of relayouting the activation
            merge = jnp.concatenate(enc, axis=-1)      # [N,h/2,w/2,4*64*T]
            k0, b0 = self.enc2[0]()
            kp0 = pack_kernel_s1(k0.astype(dt))[:, :, _concat_perm(t, 64), :]
            conv2 = jax.lax.conv_general_dilated(
                merge, kp0, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            conv2 = self.enc2_act[0](conv2 + jnp.tile(b0, 4).astype(dt))
            merge = conv2
            for i in range(1, 9):
                ki, bi = self.enc2[i]()
                conv2 = self.enc2_act[i](
                    conv_s1_packed(merge, ki, bi))
                merge = merge + conv2
            k6, b6 = self.conv6()
            x = self.conv6_act(conv_s1_packed(conv2, k6, b6))
            x = depth_to_space(x, 2)                   # logical [N,h,w,16]
        else:
            enc = [
                self.enc1_act[i](plain_conv(warped[:, i],
                                            self.enc1[abs(i - idx0)]))
                for i in range(t)
            ]
            merge = jnp.concatenate(enc, axis=-1)      # [N,h,w,64*T]

            conv2 = merge
            for i in range(9):
                conv2 = self.enc2_act[i](plain_conv(merge, self.enc2[i]))
                if i != 0:
                    merge = merge + conv2
                else:
                    merge = conv2

            x = self.conv6_act(plain_conv(conv2, self.conv6))

        x = pixel_shuffle_legacy(x, 2, 4)
        x = plain_conv(x, self.rnn_out)
        x = pixel_shuffle_legacy(x, 2, 1)
        sr = (x + bic_ref).astype(jnp.float32)

        return {
            "sr": sr[:, None],
            "uv": uv,
            "frames_y": frames_y,
            "ref_y": ref_y,
        }
