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
from jax import lax
import flax.linen as nn

from pfnl_tpu.models.blocks import ConvParams
from pfnl_tpu.models.flows import EasyFlow
from pfnl_tpu.ops.color import rgb2y
from pfnl_tpu.ops.convlstm import ConvLSTMCell
from pfnl_tpu.ops.packed_conv import (conv_down2_packed, conv_s1_packed,
                                      conv_up2_packed)
from pfnl_tpu.ops.resize import resize_bicubic
from pfnl_tpu.ops.shuffle import depth_to_space, space_to_depth
from pfnl_tpu.ops.warp import forward_warp_local, forward_warp_spmc

_xavier = nn.initializers.glorot_uniform


class _SRStep(nn.Module):
    """One encoder/ConvLSTM/decoder step over a single HR-warped frame.

    With decode=False only the encoder + ConvLSTM state update runs — the
    reference's testvideo saves ONLY the final frame's decode
    (model/drvsr.py:505, `imgs_hr_rgb[0, -1]`), so at inference the
    decoder halves of the first T-1 steps are dead work (their 720p-grid
    convs are the expensive part).

    impl="packed" runs the HR-grid convs (enc1/enc2 and the dec2/dec2_1/
    dec3 tail) on the space_to_depth(2) layout via the exact kernel
    rewrites in ops/packed_conv.py: the 1/32-channel convs at 720p are
    lane-starved on the 128-lane MXU (dec3 5x5 32->1 alone measured
    26 ms at batch 4; 2.5 ms packed — scripts/packed_conv_bench.py).
    Identical function space and param tree; "auto" = packed on TPU for
    even-sized inputs at inference scales."""

    dtype: jnp.dtype = jnp.float32
    impl: str = "auto"  # "auto" | "plain" | "packed"

    @nn.compact
    def __call__(self, state, rnn_input, decode=True):
        act = nn.relu
        dt = self.dtype
        _, oh, ow, _ = rnn_input.shape
        impl = self.impl
        if impl == "auto":
            impl = ("packed"
                    if (jax.default_backend() == "tpu"
                        and oh % 2 == 0 and ow % 2 == 0
                        and oh * ow >= 192 * 192)
                    else "plain")
        if impl not in ("plain", "packed"):
            raise ValueError(f"unknown _SRStep impl {self.impl!r}")
        packed = impl == "packed"
        if packed and (oh % 2 or ow % 2):
            raise ValueError(f"impl='packed' needs even H,W, got {oh}x{ow}")

        p = lambda name, k, ci, co: ConvParams((k, k, ci, co), _xavier(),
                                               name=name)()
        conv = lambda x, kb, stride=1: lax.conv_general_dilated(
            x, kb[0].astype(x.dtype), (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + kb[1].astype(x.dtype)
        deconv = lambda x, kb: lax.conv_transpose(
            x, kb[0].astype(x.dtype), (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + kb[1].astype(x.dtype)

        k_e1 = p("enc1", 5, 1, 32)
        k_e2 = p("enc2", 3, 32, 64)
        k_e21 = p("enc2_1", 3, 64, 64)
        k_e3 = p("enc3", 3, 64, 128)
        x = rnn_input.astype(dt)
        if packed:
            # one packing level: only the HR(720p)-grid convs run
            # s2d(2)-packed.  (Packing the 2x-grid convs a second level —
            # 180p x 256ch — measured SLOWER end-to-end, 73.3 vs 83.8 fps
            # at b4: at >= 64 lanes the 4x structural-zero FLOPs of the
            # packed kernel outweigh the layout gain.)
            xp = space_to_depth(x, 2)
            conv1 = act(conv_s1_packed(xp, k_e1[0], k_e1[1]))
            conv2 = act(conv_down2_packed(conv1, k_e2[0], k_e2[1]))
        else:
            conv1 = act(conv(x, k_e1))
            conv2 = act(conv(conv1, k_e2, stride=2))
        conv2_1 = act(conv(conv2, k_e21))
        conv3 = act(conv(conv2_1, k_e3, stride=2))
        state, y1 = ConvLSTMCell(128, (3, 3), dtype=dt,
                                 name="lstm")(state, conv3)
        if not decode:
            return state, None
        k_e31 = p("enc3_1", 3, 128, 128)
        k_d1 = p("dec1", 4, 128, 64)
        k_d11 = p("dec1_1", 3, 64, 64)
        k_d2 = p("dec2", 4, 64, 32)
        k_d21 = p("dec2_1", 3, 32, 32)
        k_d3 = p("dec3", 5, 32, 1)
        conv3_1 = act(conv(y1, k_e31))
        dec1 = act(deconv(conv3_1, k_d1))
        dec1_1 = act(conv(dec1 + conv2_1, k_d11))
        if packed:
            dec2 = act(conv_up2_packed(dec1_1, k_d2[0], k_d2[1]))
            dec2_1 = act(conv_s1_packed(dec2 + conv1, k_d21[0],
                                        k_d21[1]))
            out = conv_s1_packed(dec2_1, k_d3[0], k_d3[1])
            out = depth_to_space(out, 2)  # [N,H,W,1]
        else:
            dec2 = act(deconv(dec1_1, k_d2))
            dec2_1 = act(conv(dec2 + conv1, k_d21))
            out = conv(dec2_1, k_d3)  # no activation
        return state, out


class DRVSR(nn.Module):
    num_frames: int = 3
    scale: int = 4
    dtype: jnp.dtype = jnp.float32
    step_impl: str = "auto"  # _SRStep conv layout: "auto" | "plain" | "packed"

    def setup(self):
        self.flownet = EasyFlow(dtype=self.dtype, name="easyflow")
        self.sr_step = _SRStep(dtype=self.dtype, impl=self.step_impl,
                               name="srmodel")

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
