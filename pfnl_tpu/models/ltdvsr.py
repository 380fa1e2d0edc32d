"""RVSR-LTD: Robust Video SR with Learned Temporal Dynamics
(reference model/ltdvsr.py:31-149).

Inline pooled flow net -> forward-warp all 5 Y frames -> three temporal
branches over the center 1/3/5 warped frames, each 4 convs then
depth_to_space(4) -> a temporal-weighting net over bilinear-upscaled raw Y
frames -> softmax over the 3 branch weights -> weighted sum.  No bicubic
residual.  Output Y-channel, [N,1,H,W,1].
"""

import jax.numpy as jnp
import flax.linen as nn

from pfnl_tpu.models.blocks import xavier_uniform
from pfnl_tpu.models.flows import LTDFlow
from pfnl_tpu.ops.color import rgb2y
from pfnl_tpu.ops.resize import resize_bilinear
from pfnl_tpu.ops.shuffle import depth_to_space
from pfnl_tpu.ops.warp import forward_warp, forward_warp_local


class LTDVSR(nn.Module):
    num_frames: int = 5
    scale: int = 4
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.flownet = LTDFlow(dtype=self.dtype, name="flow")
        conv = lambda feats, k, name: nn.Conv(
            feats, (k, k), padding="SAME", kernel_init=xavier_uniform(),
            dtype=self.dtype, name=name
        )
        for b in range(3):
            setattr(self, f"branch{b}_0", conv(64, 5, f"conv{b}_0"))
            setattr(self, f"branch{b}_1", conv(64, 3, f"conv{b}_1"))
            setattr(self, f"branch{b}_3", conv(64, 3, f"conv{b}_3"))
            setattr(self, f"branch{b}_2", conv(self.scale**2, 3, f"conv{b}_2"))
        self.tem0 = conv(32, 5, "tem0")
        self.tem1 = conv(16, 5, "tem1")
        self.tem2 = conv(3, 5, "tem2")

    def _branch(self, b, x):
        act = nn.relu
        x = act(getattr(self, f"branch{b}_0")(x))
        x = act(getattr(self, f"branch{b}_1")(x))
        x = act(getattr(self, f"branch{b}_3")(x))
        x = getattr(self, f"branch{b}_2")(x)  # no activation
        return depth_to_space(x, self.scale)

    def __call__(self, frames_lr):
        n, t, h, w, c = frames_lr.shape
        out_h, out_w = h * self.scale, w * self.scale
        idx0 = t // 2
        frames_y = rgb2y(frames_lr.astype(self.dtype))
        ref_y = frames_y[:, idx0]

        flat = frames_y.reshape(n * t, h, w, 1)
        ref_rep = jnp.broadcast_to(ref_y[:, None], (n, t, h, w, 1)).reshape(n * t, h, w, 1)
        uv = self.flownet(flat, ref_rep)
        # LTDFlow ends in tanh -> |uv| <= 1: scatter-free local splat
        warped = forward_warp_local(flat, uv, max_disp=1).reshape(n, t, h, w, 1)
        uv = uv.reshape(n, t, h, w, 2)

        def cat(lo, hi):  # concat warped frames [lo, hi) along channels
            return warped[:, lo:hi].transpose(0, 2, 3, 1, 4).reshape(n, h, w, hi - lo)

        est0 = self._branch(0, cat(idx0, idx0 + 1))
        est1 = self._branch(1, cat(idx0 - 1, idx0 + 2))
        est2 = self._branch(2, cat(idx0 - 2, idx0 + 3))

        # temporal weighting over bilinear-upscaled raw Y frames
        bil = resize_bilinear(frames_y, (out_h, out_w))  # [N,T,H,W,1]
        tem = bil.transpose(0, 2, 3, 1, 4).reshape(n, out_h, out_w, t)
        tem = nn.relu(self.tem0(tem))
        tem = nn.relu(self.tem1(tem))
        weights = nn.softmax(self.tem2(tem), axis=-1)  # [N,H,W,3]

        sr = (
            est0 * weights[..., 0:1]
            + est1 * weights[..., 1:2]
            + est2 * weights[..., 2:3]
        ).astype(jnp.float32)

        return {
            "sr": sr[:, None],
            "uv": uv,
            "frames_y": frames_y,
            "ref_y": ref_y,
        }
