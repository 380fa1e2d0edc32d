"""DRVSR: Detail-revealing Deep Video Super-Resolution
(reference model/drvsr.py:25-189).

SPMC path: EasyFlow at LR, then forward (splat) warp each Y frame DIRECTLY
onto the x4 HR grid (model/drvsr.py:145) — the upscale-while-warping trick.
Encoder (two stride-2 convs) -> ConvLSTM @128ch at 1/4 HR resolution ->
decoder with transpose convs and skip adds -> + bicubic of the center Y.
Per-frame outputs are stacked [N,T,H,W,1]; the loss weights them by a
normalized linspace(0.5, 1.0) (model/drvsr.py:38-39,207).

The T-step recurrence runs as a compiled `lax.scan` over the ConvLSTM
carry (the reference unrolls a Python loop in graph mode).
"""

import jax
import jax.numpy as jnp
import flax.linen as nn

from pfnl_tpu.models.flows import EasyFlow
from pfnl_tpu.ops.color import rgb2y
from pfnl_tpu.ops.convlstm import ConvLSTMCell
from pfnl_tpu.ops.resize import resize_bicubic
from pfnl_tpu.ops.warp import forward_warp_local, forward_warp_spmc

_xavier = nn.initializers.glorot_uniform


class _SRStep(nn.Module):
    """One encoder/ConvLSTM/decoder step over a single HR-warped frame.

    With decode=False only the encoder + ConvLSTM state update runs — the
    reference's testvideo saves ONLY the final frame's decode
    (model/drvsr.py:505, `imgs_hr_rgb[0, -1]`), so at inference the
    decoder halves of the first T-1 steps are dead work (their 720p-grid
    convs are the expensive part)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, state, rnn_input, decode=True):
        act = nn.relu
        conv = lambda feats, k, name, stride=1: nn.Conv(
            feats, (k, k), strides=(stride, stride), padding="SAME",
            kernel_init=_xavier(), dtype=self.dtype, name=name,
        )
        deconv = lambda feats, k, name: nn.ConvTranspose(
            feats, (k, k), strides=(2, 2), padding="SAME",
            kernel_init=_xavier(), dtype=self.dtype, name=name,
        )
        conv1 = act(conv(32, 5, "enc1")(rnn_input))
        conv2 = act(conv(64, 3, "enc2", stride=2)(conv1))
        conv2_1 = act(conv(64, 3, "enc2_1")(conv2))
        conv3 = act(conv(128, 3, "enc3", stride=2)(conv2_1))
        state, y1 = ConvLSTMCell(128, (3, 3), dtype=self.dtype,
                                 name="lstm")(state, conv3)
        if not decode:
            return state, None
        conv3_1 = act(conv(128, 3, "enc3_1")(y1))
        dec1 = act(deconv(64, 4, "dec1")(conv3_1))
        dec1_1 = act(conv(64, 3, "dec1_1")(dec1 + conv2_1))
        dec2 = act(deconv(32, 4, "dec2")(dec1_1))
        dec2_1 = act(conv(32, 3, "dec2_1")(dec2 + conv1))
        out = conv(1, 5, "dec3")(dec2_1)  # no activation
        return state, out


class DRVSR(nn.Module):
    num_frames: int = 3
    scale: int = 4
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.flownet = EasyFlow(dtype=self.dtype, name="easyflow")
        self.sr_step = _SRStep(dtype=self.dtype, name="srmodel")

    def __call__(self, frames_lr, last_only=False):
        n, t, h, w, c = frames_lr.shape
        out_h, out_w = h * self.scale, w * self.scale
        idx0 = t // 2
        frames_y = rgb2y(frames_lr.astype(self.dtype))
        ref_y = frames_y[:, idx0]
        bic_ref = resize_bicubic(ref_y, (out_h, out_w))

        flat = frames_y.reshape(n * t, h, w, 1)
        ref_rep = jnp.broadcast_to(ref_y[:, None], (n, t, h, w, 1)).reshape(n * t, h, w, 1)
        uv = self.flownet(flat, ref_rep)
        # SPMC HR splat: Pallas phase-accumulation kernel + analytic
        # gather adjoint (ops/pallas/spmc_splat.py) — scatter-free in
        # both directions; EasyFlow's tanh-bounded flow keeps |uv| <= 2
        warped_hr = forward_warp_spmc(flat, uv, self.scale).reshape(
            n, t, out_h, out_w, 1)
        # the LR-grid flow-loss warp is EasyFlow-bounded (|uv| <= 2)
        warped_lr = forward_warp_local(flat, uv, max_disp=2).reshape(n, t, h, w, 1)
        uv = uv.reshape(n, t, h, w, 2)

        state0 = ConvLSTMCell.zero_state(n, out_h // 4, out_w // 4, 128, self.dtype)

        if last_only:
            # inference: the reference saves only the LAST frame's decode
            # (model/drvsr.py:505) — run encoder+LSTM for frames 0..T-2
            # (unrolled: T=3) and decode once.  Bit-identical to the full
            # scan's final slice; skips (T-1) decoder passes whose 720p
            # convs dominate the trunk.
            state = state0
            for i in range(t - 1):
                state, _ = self.sr_step(state, warped_hr[:, i], decode=False)
            _, out_last = self.sr_step(state, warped_hr[:, t - 1])
            outs = out_last[:, None]  # [N,1,H,W,1]
        else:
            scan_fn = nn.scan(
                lambda mdl, st, xi: mdl(st, xi),
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=1,
                out_axes=1,
            )
            _, outs = scan_fn(self.sr_step, state0, warped_hr)
        sr = (outs + bic_ref[:, None]).astype(jnp.float32)

        return {
            "sr": sr,                 # [N,T,H,W,1]
            "uv": uv,
            "frames_y": frames_y,
            "ref_y": ref_y,
            # loss-facing: widened like "sr" (flow photometric loss input)
            "warped_lr": warped_lr.astype(jnp.float32),
        }
