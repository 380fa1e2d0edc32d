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

import jax.numpy as jnp
import flax.linen as nn

from pfnl_tpu.models.flows import FRVSRFlow
from pfnl_tpu.ops.resize import resize_bilinear
from pfnl_tpu.ops.shuffle import space_to_depth
from pfnl_tpu.ops.warp import forward_warp_local


class FRVSR(nn.Module):
    num_frames: int = 10
    scale: int = 4
    mf: int = 128
    num_blocks: int = 10
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        conv = lambda feats, k, name: nn.Conv(feats, (k, k), padding="SAME",
                                              dtype=self.dtype, name=name)
        self.flownet = FRVSRFlow(dtype=self.dtype, name="flow")
        self.conv0_0 = conv(self.mf, 3, "conv0_0")
        self.conv0_1 = conv(self.mf, 3, "conv0_1")
        self.conv1 = [conv(self.mf, 3, f"conv1_{j}") for j in range(self.num_blocks)]
        self.conv2 = [conv(self.mf, 3, f"conv2_{j}") for j in range(self.num_blocks)]
        self.large1 = nn.ConvTranspose(self.mf, (3, 3), strides=(2, 2),
                                       padding="SAME", dtype=self.dtype,
                                       name="large1")
        self.large2 = nn.ConvTranspose(self.mf, (3, 3), strides=(2, 2),
                                       padding="SAME", dtype=self.dtype,
                                       name="large2")
        self.out_conv = conv(3, 3, "out")

    def _trunk(self, inp, first: bool):
        act = nn.relu
        conv0 = act((self.conv0_0 if first else self.conv0_1)(inp))
        for j in range(self.num_blocks):
            c1 = act(self.conv1[j](conv0))
            c2 = self.conv2[j](c1)
            conv0 = conv0 + c2
        x = act(self.large1(conv0))
        x = act(self.large2(x))
        return self.out_conv(x)

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
