"""VESPCN: Real-Time Video SR with Spatio-Temporal Networks and Motion
Compensation (reference model/vespcn.py:30-106).

Pipeline: rgb2y -> per-frame EasyFlow vs. the center frame -> forward
(splat) warp each Y frame -> concat -> 5x5@24 + 9x(3x3@24) PReLU convs ->
legacy pixel shuffle x2 twice -> + bicubic of the center Y frame.
Output is the Y channel only, [N,1,H,W,1]; test-time RGB pairs the SR Y
with bicubic-upscaled CbCr (model/vespcn.py:334-346) — see
pfnl_tpu.infer.predictor.

Returns a dict: sr [N,1,H,W,1], uv [N,T,h,w,2], frames_y, ref_y (the flow
loss consumes uv/frames_y/ref_y, model/vespcn.py:121-127).

trunk_impl="packed" runs the 24-channel conv stack on the
space_to_depth(2) layout (exact kernel rewrites, ops/packed_conv.py —
24 of 128 MXU lanes live on the plain layout).  Identical function
space and param tree; "auto" = packed on TPU for even LR sizes.
"""

import jax
import jax.numpy as jnp
import flax.linen as nn

from pfnl_tpu.models.blocks import ConvParams, PReLU, xavier_uniform
from pfnl_tpu.models.flows import EasyFlow
from pfnl_tpu.ops.color import rgb2y
from pfnl_tpu.ops.packed_conv import conv_s1_packed
from pfnl_tpu.ops.resize import resize_bicubic
from pfnl_tpu.ops.shuffle import depth_to_space, pixel_shuffle_legacy, space_to_depth
from pfnl_tpu.ops.warp import forward_warp, forward_warp_local


class VESPCN(nn.Module):
    num_frames: int = 3
    scale: int = 4
    trunk_impl: str = "auto"  # "auto" | "plain" | "packed"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.flownet = EasyFlow(dtype=self.dtype, name="easyflow")
        conv = lambda co, k, ci, name: ConvParams((k, k, ci, co),
                                                  xavier_uniform(), name=name)
        self.enc1 = conv(24, 5, self.num_frames, "enc1")
        self.enc2 = [conv(24, 3, 24, f"enc2_{i}") for i in range(9)]
        self.conv6 = conv(16, 3, 24, "conv6")
        self.rnn_out = conv(4, 3, 4, "rnn_out")
        chans = [24] * 10 + [16, 4]
        self.acts = [PReLU(channels=chans[i], name=f"prelu_{i}")
                     for i in range(12)]

    def __call__(self, frames_lr):
        n, t, h, w, c = frames_lr.shape
        out_h, out_w = h * self.scale, w * self.scale
        idx0 = t // 2
        dt = self.dtype
        frames_y = rgb2y(frames_lr.astype(dt))  # [N,T,h,w,1]
        ref_y = frames_y[:, idx0]
        bic_ref = resize_bicubic(ref_y, (out_h, out_w))

        impl = self.trunk_impl
        if impl == "auto":
            impl = ("packed"
                    if jax.default_backend() == "tpu" and h % 2 == 0
                    and w % 2 == 0 else "plain")
        if impl not in ("plain", "packed"):
            raise ValueError(f"unknown VESPCN trunk_impl {self.trunk_impl!r}")
        if impl == "packed" and (h % 2 or w % 2):
            raise ValueError(f"trunk_impl='packed' needs even h,w, got {h}x{w}")

        # shared-weight flow per frame: fold T into batch for one flow pass
        flat = frames_y.reshape(n * t, h, w, 1)
        ref_rep = jnp.broadcast_to(ref_y[:, None], (n, t, h, w, 1)).reshape(n * t, h, w, 1)
        uv = self.flownet(flat, ref_rep)  # [N*T,h,w,2]
        # EasyFlow = two tanh stages -> |uv| <= 2: scatter-free local splat
        warped = forward_warp_local(flat, uv, max_disp=2)  # [N*T,h,w,1]
        uv = uv.reshape(n, t, h, w, 2)
        sr_input = warped.reshape(n, t, h, w, 1).transpose(0, 2, 3, 1, 4).reshape(n, h, w, t)

        def plain_conv(x, kb):
            k, b = kb()
            o = jax.lax.conv_general_dilated(
                x, k.astype(dt), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return o + b.astype(dt)

        a = iter(self.acts)
        if impl == "packed":
            xp = space_to_depth(sr_input, 2)             # [n,h/2,w/2,4t]
            k1, b1 = self.enc1()
            xp = next(a)(conv_s1_packed(xp, k1, b1))
            for conv_i in self.enc2:
                ki, bi = conv_i()
                xp = next(a)(conv_s1_packed(xp, ki, bi))
            k6, b6 = self.conv6()
            xp = next(a)(conv_s1_packed(xp, k6, b6))
            x = depth_to_space(xp, 2)                    # logical [n,h,w,16]
        else:
            x = next(a)(plain_conv(sr_input, self.enc1))
            for conv_i in self.enc2:
                x = next(a)(plain_conv(x, conv_i))
            x = next(a)(plain_conv(x, self.conv6))
        x = pixel_shuffle_legacy(x, 2, 4)
        x = plain_conv(x, self.rnn_out)  # no activation (model/vespcn.py:98)
        x = pixel_shuffle_legacy(x, 2, 1)
        sr = (x + bic_ref).astype(jnp.float32)

        return {
            "sr": sr[:, None],
            "uv": uv,
            "frames_y": frames_y,
            "ref_y": ref_y,
        }
