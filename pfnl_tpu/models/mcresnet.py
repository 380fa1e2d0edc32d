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
"""

import jax.numpy as jnp
import flax.linen as nn

from pfnl_tpu.models.blocks import PReLU, xavier_uniform
from pfnl_tpu.models.flows import EasyFlow
from pfnl_tpu.ops.color import rgb2y
from pfnl_tpu.ops.resize import resize_bicubic
from pfnl_tpu.ops.shuffle import pixel_shuffle_legacy
from pfnl_tpu.ops.warp import forward_warp, forward_warp_local


class MCResNet(nn.Module):
    num_frames: int = 5
    scale: int = 4
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.flownet = EasyFlow(dtype=self.dtype, name="easyflow")
        conv = lambda feats, k, name: nn.Conv(
            feats, (k, k), padding="SAME", kernel_init=xavier_uniform(),
            dtype=self.dtype, name=name
        )
        radius = self.num_frames // 2
        self.enc1 = [conv(64, 5, f"enc1_{d}") for d in range(radius + 1)]
        self.enc1_act = [PReLU(name=f"enc1_prelu_{i}") for i in range(self.num_frames)]
        self.enc2 = [conv(32, 3, f"enc2_{i}") for i in range(9)]
        self.enc2_act = [PReLU(name=f"enc2_prelu_{i}") for i in range(9)]
        self.conv6 = conv(16, 3, "conv6")
        self.conv6_act = PReLU(name="conv6_prelu")
        self.rnn_out = conv(4, 3, "rnn_out")

    def __call__(self, frames_lr):
        n, t, h, w, c = frames_lr.shape
        out_h, out_w = h * self.scale, w * self.scale
        idx0 = t // 2
        frames_y = rgb2y(frames_lr.astype(self.dtype))
        ref_y = frames_y[:, idx0]
        bic_ref = resize_bicubic(ref_y, (out_h, out_w))

        flat = frames_y.reshape(n * t, h, w, 1)
        ref_rep = jnp.broadcast_to(ref_y[:, None], (n, t, h, w, 1)).reshape(n * t, h, w, 1)
        uv = self.flownet(flat, ref_rep)
        # EasyFlow = two tanh stages -> |uv| <= 2: scatter-free local splat
        warped = forward_warp_local(flat, uv, max_disp=2).reshape(n, t, h, w, 1)
        uv = uv.reshape(n, t, h, w, 2)

        # distance-shared encoders
        enc = [
            self.enc1_act[i](self.enc1[abs(i - idx0)](warped[:, i])) for i in range(t)
        ]
        merge = jnp.concatenate(enc, axis=-1)  # [N,h,w,64*T]

        conv2 = merge
        for i in range(9):
            conv2 = self.enc2_act[i](self.enc2[i](merge))
            if i != 0:
                merge = merge + conv2
            else:
                merge = conv2

        x = self.conv6_act(self.conv6(conv2))
        x = pixel_shuffle_legacy(x, 2, 4)
        x = self.rnn_out(x)
        x = pixel_shuffle_legacy(x, 2, 1)
        sr = (x + bic_ref).astype(jnp.float32)

        return {
            "sr": sr[:, None],
            "uv": uv,
            "frames_y": frames_y,
            "ref_y": ref_y,
        }
