"""FRVSR: Frame-Recurrent Video Super-Resolution
(reference model/frvsr.py:21-148).

Recurrence: at step i>0 estimate flow(x_i, x_{i-1}) with the inline U-net,
bilinearly upsample the flow to HR (values NOT rescaled — quirk preserved,
model/frvsr.py:100), forward-warp the previous SR frame, space_to_depth(4)
it back onto the LR grid and concatenate with the current LR frame.  The SR
trunk is 10 residual blocks @128ch + two stride-2 transpose convs.  The
first step uses a separate conv0 (no warped estimate), as in the reference
(model/frvsr.py:53-56).

Training unrolls `num_frames` steps (10) and additionally returns the
LR-grid forward warps used by the flow loss (model/frvsr.py:121,144).
Streaming inference uses `.step()` frame-by-frame with O(1) state, matching
the reference's stateful test path (model/frvsr.py:279-303).
"""

import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

from pfnl_tpu.models.blocks import ConvParams
from pfnl_tpu.models.flows import FRVSRFlow
from pfnl_tpu.ops.packed_conv import conv_s1_packed, conv_up2_packed
from pfnl_tpu.ops.resize import resize_bilinear
from pfnl_tpu.ops.shuffle import depth_to_space, space_to_depth
from pfnl_tpu.ops.warp import forward_warp_local


class FRVSR(nn.Module):
    num_frames: int = 10
    scale: int = 4
    mf: int = 128
    num_blocks: int = 10
    dtype: jnp.dtype = jnp.float32
    # HR-tail conv layout (large2 + out run at 720p with 128->3 channels —
    # lane-starved on the MXU; "packed" executes them space_to_depth(2)-
    # packed via the exact rewrites in ops/packed_conv.py)
    tail_impl: str = "auto"  # "auto" | "plain" | "packed"

    def setup(self):
        conv = lambda feats, k, name: nn.Conv(feats, (k, k), padding="SAME",
                                              dtype=self.dtype, name=name)
        lecun = nn.initializers.lecun_normal  # flax conv default init
        self.flownet = FRVSRFlow(dtype=self.dtype, name="flow")
        self.conv0_0 = conv(self.mf, 3, "conv0_0")
        self.conv0_1 = conv(self.mf, 3, "conv0_1")
        self.conv1 = [conv(self.mf, 3, f"conv1_{j}") for j in range(self.num_blocks)]
        self.conv2 = [conv(self.mf, 3, f"conv2_{j}") for j in range(self.num_blocks)]
        self.large1 = nn.ConvTranspose(self.mf, (3, 3), strides=(2, 2),
                                       padding="SAME", dtype=self.dtype,
                                       name="large1")
        # raw params (same tree/init as the nn.ConvTranspose/nn.Conv they
        # replace) so the execution layout stays selectable
        self.large2 = ConvParams((3, 3, self.mf, self.mf), lecun(),
                                 name="large2")
        self.out_conv = ConvParams((3, 3, self.mf, 3), lecun(), name="out")

    def _trunk(self, inp, first: bool):
        act = nn.relu
        conv0 = act((self.conv0_0 if first else self.conv0_1)(inp))
        for j in range(self.num_blocks):
            c1 = act(self.conv1[j](conv0))
            c2 = self.conv2[j](c1)
            conv0 = conv0 + c2
        x = act(self.large1(conv0))
        k2, b2 = self.large2()
        ko, bo = self.out_conv()
        impl = self.tail_impl
        if impl == "auto":
            hh, ww = x.shape[1], x.shape[2]
            impl = ("packed"
                    if (jax.default_backend() == "tpu"
                        and hh % 2 == 0 and ww % 2 == 0
                        and hh * ww * 4 >= 192 * 192)
                    else "plain")
        if impl not in ("plain", "packed"):
            raise ValueError(f"unknown FRVSR tail_impl {self.tail_impl!r}")
        if impl == "packed":
            xp = act(conv_up2_packed(x, k2.astype(x.dtype), b2))
            out = conv_s1_packed(xp, ko.astype(x.dtype), bo)
            return depth_to_space(out, 2)
        x = act(lax.conv_transpose(
            x, k2.astype(x.dtype), (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b2.astype(x.dtype))
        return lax.conv_general_dilated(
            x, ko.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bo.astype(x.dtype)

    def _upscale_warp(self, uv, est):
        """Warp previous SR estimate with the (unscaled) HR-resized flow and
        fold back to the LR grid (model/frvsr.py:98-104)."""
        hh, ww = est.shape[1], est.shape[2]
        upuv = resize_bilinear(uv, (hh, ww))
        # flow is tanh-bounded and UNSCALED by the resize -> |uv|<=1:
        # the scatter-free local splat applies (exact)
        warp_est = forward_warp_local(est, upuv, max_disp=1)
        return space_to_depth(warp_est, self.scale)

    def step(self, x, xp=None, est=None):
        """One recurrent step. x: current LR [N,h,w,3]; xp: previous LR;
        est: previous SR [N,H,W,3].  Returns SR [N,H,W,3]."""
        x = x.astype(self.dtype)
        if xp is None:
            return self._trunk(x, first=True)
        xp = xp.astype(self.dtype)
        est = est.astype(self.dtype)
        uv = self.flownet(x, xp)
        est_lr = self._upscale_warp(uv, est)
        return self._trunk(jnp.concatenate([x, est_lr], axis=-1), first=False)

    def __call__(self, frames_lr):
        frames_lr = frames_lr.astype(self.dtype)
        n, t, h, w, c = frames_lr.shape
        srs = []
        warps = []
        sr = None
        for i in range(t):
            x = frames_lr[:, i]
            if i == 0:
                sr = self.step(x)
            else:
                xp = frames_lr[:, i - 1]
                uv = self.flownet(x, xp)
                warps.append(forward_warp_local(xp, uv, max_disp=1))
                est_lr = self._upscale_warp(uv, sr)
                sr = self._trunk(jnp.concatenate([x, est_lr], axis=-1), first=False)
            srs.append(sr)
        return {
            "sr": jnp.stack(srs, axis=1).astype(jnp.float32),   # [N,T,H,W,3]
            # loss-facing output: widened like "sr" so the flow-consistency
            # loss doesn't silently compute in bf16
            "warps": jnp.stack(warps, axis=1).astype(jnp.float32),  # [N,T-1,h,w,3]
        }
