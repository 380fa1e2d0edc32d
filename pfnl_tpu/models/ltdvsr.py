"""RVSR-LTD: Robust Video SR with Learned Temporal Dynamics
(reference model/ltdvsr.py:31-149).

Inline pooled flow net -> forward-warp all 5 Y frames -> three temporal
branches over the center 1/3/5 warped frames, each 4 convs then
depth_to_space(4) -> a temporal-weighting net over bilinear-upscaled raw Y
frames -> softmax over the 3 branch weights -> weighted sum.  No bicubic
residual.  Output Y-channel, [N,1,H,W,1].

tem_impl="packed" runs the temporal-weighting convs (5x5, channels
5->32->16->3, on the FULL 720p HR grid) on the space_to_depth(2)
layout — the lane-starved HR-tail pattern from ops/packed_conv.py
(measured 70.7 of the 130 ms step at bench geometry,
scripts/ltdvsr_bench.py).  Exact kernel rewrites: identical function
space and param tree.  "auto" = packed on TPU for even HR sizes.
"""

import jax
import jax.numpy as jnp
import flax.linen as nn

from pfnl_tpu.models.blocks import ConvParams, xavier_uniform
from pfnl_tpu.models.flows import LTDFlow
from pfnl_tpu.ops.color import rgb2y
from pfnl_tpu.ops.packed_conv import conv_s1_packed
from pfnl_tpu.ops.resize import resize_bilinear
from pfnl_tpu.ops.shuffle import depth_to_space, space_to_depth
from pfnl_tpu.ops.warp import forward_warp, forward_warp_local


class LTDVSR(nn.Module):
    num_frames: int = 5
    scale: int = 4
    tem_impl: str = "auto"  # "auto" | "plain" | "packed"
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
        # ConvParams keeps the param tree identical to nn.Conv while
        # letting the execution layout vary (plain vs packed).
        self.tem0 = ConvParams((5, 5, self.num_frames, 32),
                               xavier_uniform(), name="tem0")
        self.tem1 = ConvParams((5, 5, 32, 16), xavier_uniform(), name="tem1")
        self.tem2 = ConvParams((5, 5, 16, 3), xavier_uniform(), name="tem2")

    def _tem_conv(self, kb, x):
        k, b = kb
        o = jax.lax.conv_general_dilated(
            x, k.astype(self.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return o + b.astype(self.dtype)

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
        impl = self.tem_impl
        if impl == "auto":
            impl = ("packed"
                    if jax.default_backend() == "tpu" and out_h % 2 == 0
                    and out_w % 2 == 0 else "plain")
        if impl not in ("plain", "packed"):
            raise ValueError(f"unknown LTDVSR tem_impl {self.tem_impl!r}")
        if impl == "packed" and (out_h % 2 or out_w % 2):
            raise ValueError(
                f"tem_impl='packed' needs even HR sizes, got {out_h}x{out_w}")

        bil = resize_bilinear(frames_y, (out_h, out_w))  # [N,T,H,W,1]
        tem = bil.transpose(0, 2, 3, 1, 4).reshape(n, out_h, out_w, t)
        k0, k1, k2 = self.tem0(), self.tem1(), self.tem2()
        if impl == "packed":
            tp = space_to_depth(tem, 2)                  # [N,H/2,W/2,4T]
            tp = nn.relu(conv_s1_packed(tp, k0[0].astype(self.dtype), k0[1]))
            tp = nn.relu(conv_s1_packed(tp, k1[0].astype(self.dtype), k1[1]))
            tp = conv_s1_packed(tp, k2[0].astype(self.dtype), k2[1])
            logits = depth_to_space(tp, 2)               # [N,H,W,3]
        else:
            tem = nn.relu(self._tem_conv(k0, tem))
            tem = nn.relu(self._tem_conv(k1, tem))
            logits = self._tem_conv(k2, tem)
        weights = nn.softmax(logits, axis=-1)  # [N,H,W,3]

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
