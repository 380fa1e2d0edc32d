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
"""

import jax.numpy as jnp
import flax.linen as nn

from pfnl_tpu.models.blocks import PReLU, xavier_uniform
from pfnl_tpu.models.flows import EasyFlow
from pfnl_tpu.ops.color import rgb2y
from pfnl_tpu.ops.resize import resize_bicubic
from pfnl_tpu.ops.shuffle import pixel_shuffle_legacy
from pfnl_tpu.ops.warp import forward_warp, forward_warp_local


class VESPCN(nn.Module):
    num_frames: int = 3
    scale: int = 4
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.flownet = EasyFlow(dtype=self.dtype, name="easyflow")
        conv = lambda feats, k, name: nn.Conv(
            feats, (k, k), padding="SAME", kernel_init=xavier_uniform(),
            dtype=self.dtype, name=name
        )
        self.enc1 = conv(24, 5, "enc1")
        self.enc2 = [conv(24, 3, f"enc2_{i}") for i in range(9)]
        self.conv6 = conv(16, 3, "conv6")
        self.rnn_out = conv(4, 3, "rnn_out")
        self.acts = [PReLU(name=f"prelu_{i}") for i in range(12)]

    def __call__(self, frames_lr):
        n, t, h, w, c = frames_lr.shape
        out_h, out_w = h * self.scale, w * self.scale
        idx0 = t // 2
        frames_y = rgb2y(frames_lr.astype(self.dtype))  # [N,T,h,w,1]
        ref_y = frames_y[:, idx0]
        bic_ref = resize_bicubic(ref_y, (out_h, out_w))

        # shared-weight flow per frame: fold T into batch for one flow pass
        flat = frames_y.reshape(n * t, h, w, 1)
        ref_rep = jnp.broadcast_to(ref_y[:, None], (n, t, h, w, 1)).reshape(n * t, h, w, 1)
        uv = self.flownet(flat, ref_rep)  # [N*T,h,w,2]
        # EasyFlow = two tanh stages -> |uv| <= 2: scatter-free local splat
        warped = forward_warp_local(flat, uv, max_disp=2)  # [N*T,h,w,1]
        uv = uv.reshape(n, t, h, w, 2)
        sr_input = warped.reshape(n, t, h, w, 1).transpose(0, 2, 3, 1, 4).reshape(n, h, w, t)

        a = iter(self.acts)
        x = next(a)(self.enc1(sr_input))
        for conv_i in self.enc2:
            x = next(a)(conv_i(x))
        x = next(a)(self.conv6(x))
        x = pixel_shuffle_legacy(x, 2, 4)
        x = self.rnn_out(x)  # no activation (model/vespcn.py:98)
        x = pixel_shuffle_legacy(x, 2, 1)
        sr = (x + bic_ref).astype(jnp.float32)

        return {
            "sr": sr[:, None],
            "uv": uv,
            "frames_y": frames_y,
            "ref_y": ref_y,
        }
