"""DUF: Deep Video SR Using Dynamic Upsampling Filters
(reference model/dufvsr.py:19-58 + model/nets.py FR_16L/28L/52L backbones).

A dense 3-D conv network over the 7-frame clip produces per-pixel dynamic
upsampling filters Fx [B,1,H,W,25,16] (softmaxed over the 25 taps) and a
residual Rx [B,1,H,W,3*16]; the center frame is filtered per RGB channel
with `dyn_filter_3d` + depth_to_space, then the residual is added.

Backbone structure (model/nets.py): dense blocks
(BN-relu-1x1x1 -> BN-relu-3x3x3, concat growth) with the last 3 blocks
using temporally-VALID 3x3x3 convs that shrink T 7->1.  BatchNorm is the
reference's hand-rolled moving-average BN (utils.py:251-278) with
moving_variance initialized to 0 (quirk preserved) and the TF
zero_debias bias correction (assign_moving_average(..., zero_debias=
True)): the stored moving stat is the biased EMA divided by
(1 - decay^t), so it tracks the batch statistics almost immediately.
Without it, eval stats sit at (1 - 0.999^t) of their true magnitude
for thousands of steps, and the ~40 stacked rsqrt amplifications made
early DUF evals astronomically wrong (measured -126 dB at step 250).

TPU notes: 3-D convs lower to XLA ConvGeneral in NDHWC; `is_train` is a
static Python bool so train/eval trace separately (the reference used a
tf.cond placeholder).
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax import lax

from pfnl_tpu.ops.dynfilter import dyn_filter_3d
from pfnl_tpu.ops.shuffle import depth_to_space, depth_to_space_3d

_he_trunc = nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal")

# layer-count -> (num_thw_blocks, num_hw_blocks, growth, conv2_in)
_FR_CONFIGS = {
    16: (3, 3, 32, 256),
    28: (9, 3, 16, 256),
    52: (21, 3, 16, 448),
}


class Conv3D(nn.Module):
    """VALID 3-D conv with explicit padding mode, NDHWC.

    pad: "hw" pads H/W by 1 (reference `sp`), "thw" pads T/H/W by 1
    (reference `stp`), "none" no padding.

    impl="pallas" routes 3x3x3 kernels through the tap-packed Pallas
    kernel (ops/pallas/duf_dense.py) — the dense-block growth convs'
    G=16 output channels use 16/128 MXU lanes natively (~10 TFLOP/s
    measured); tap-packing makes N=144."""

    features: int
    kernel: Tuple[int, int, int]
    in_features: int
    pad: str = "none"
    use_bias: bool = True
    impl: str = "xla"

    def setup(self):
        kt, kh, kw = self.kernel
        self.w = self.param(
            "W", _he_trunc, (kt, kh, kw, self.in_features, self.features))
        if self.use_bias:
            self.b = self.param("b", nn.initializers.zeros, (self.features,))

    def __call__(self, x):
        assert x.shape[-1] == self.in_features
        w = self.w
        if self.impl == "pallas" and self.kernel == (3, 3, 3) and self.pad != "none":
            # conv3x3x3_tap always pads H/W SAME; pad="none" (VALID
            # everywhere) has no kernel variant — fall through to XLA
            from pfnl_tpu.ops.pallas.duf_dense import conv3x3x3_tap

            y = conv3x3x3_tap(x, w, self.pad == "thw")
        else:
            if self.pad == "thw":
                x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
            elif self.pad == "hw":
                x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
            # Native Conv3D for everything else.  Measured end-to-end
            # alternatives on v5e (720p batch 1): time-shifted 2-D
            # decomposition 2.4 fps, kt=1-only fold 3.3 fps, native 3-D
            # 5.5 fps — mixing 2-D and 3-D conv layouts inserts relayout
            # copies between every dense-block layer that cost more than
            # the Conv3D lowering loses.  The 1x1x1/1x3x3 convs have
            # N>=64..512 and stay XLA.
            y = lax.conv_general_dilated(
                x, w.astype(x.dtype), (1, 1, 1), "VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
        if self.use_bias:
            y = y + self.b.astype(y.dtype)
        return y


class RefBatchNorm(nn.Module):
    """Hand-rolled moving-average BN (reference utils.py:251-278).
    eps=1e-3; moving_variance init 0 (reference quirk, utils.py:267).

    Moving stats use TF's zero_debias correction (assign_moving_average
    with zero_debias=True): a biased EMA accumulator plus a step count,
    with the READ value biased/(1 - decay^t).  After a single update the
    moving stat already equals the batch stat (TF-oracle-verified; a
    plain EMA from 0 would be 1000x smaller at decay=0.999).  At t=0 the
    read is exactly 0 — the reference's step-0 eval explosion is real
    parity, not a bug here.

    Stats and the affine run in f32; the output is cast back to the
    input dtype so a bf16 activation stream stays bf16 (XLA fuses the
    widen/narrow into the neighbouring conv)."""

    features: int
    decay: float = 0.999

    def setup(self):
        fdim = (self.features,)
        self.beta = self.param("beta", nn.initializers.zeros, fdim)
        self.gamma = self.param("gamma", nn.initializers.ones, fdim)
        self.mov_mean = self.variable(
            "batch_stats", "moving_mean", jnp.zeros, fdim)
        self.mov_var = self.variable(
            "batch_stats", "moving_variance", jnp.zeros, fdim)
        # zero_debias shadow state (TF moving_averages.py: `biased` and
        # `local_step` sub-variables next to each moving average)
        self.biased_mean = self.variable(
            "batch_stats", "biased_mean", jnp.zeros, fdim)
        self.biased_var = self.variable(
            "batch_stats", "biased_var", jnp.zeros, fdim)
        self.local_step = self.variable(
            "batch_stats", "local_step", jnp.zeros, ())

    def __call__(self, x, is_train: bool):
        assert x.shape[-1] == self.features
        if is_train:
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axes)
            var = jnp.var(xf, axes)
            if not self.is_initializing():
                d = self.decay
                self.biased_mean.value = (
                    self.biased_mean.value * d + mean * (1 - d))
                self.biased_var.value = (
                    self.biased_var.value * d + var * (1 - d))
                t = self.local_step.value + 1.0
                self.local_step.value = t
                debias = 1.0 - jnp.power(d, t)
                self.mov_mean.value = self.biased_mean.value / debias
                self.mov_var.value = self.biased_var.value / debias
        else:
            mean, var = self.mov_mean.value, self.mov_var.value
        inv = lax.rsqrt(var + 1e-3)
        out = self.gamma * (x.astype(jnp.float32) - mean) * inv + self.beta
        return out.astype(x.dtype)

    def folded(self):
        """Inference-mode affine (scale, offset): sx+o == BN(x)."""
        s = self.gamma * lax.rsqrt(self.mov_var.value + 1e-3)
        return s, self.beta - self.mov_mean.value * s


class FRNet(nn.Module):
    """Dense 3-D backbone producing (filters, residual)
    (reference model/nets.py:9-150)."""

    layers: int = 52
    scale: int = 4
    conv3d_impl: str = "auto"  # "auto" | "fused" | "pallas" | "xla"

    @nn.compact
    def __call__(self, x, is_train: bool):
        n_thw, n_hw, growth, conv2_in = _FR_CONFIGS[self.layers]
        r2 = self.scale * self.scale
        impl = self.conv3d_impl
        if impl == "auto":
            # "fused" = whole-block Pallas chain (inference only; measured
            # rationale in ops/pallas/duf_block.py); training keeps the
            # XLA lowering with its native vjp and live batch stats
            impl = ("fused" if jax.default_backend() == "tpu"
                    and not is_train else "xla")
        x = Conv3D(64, (1, 3, 3), in_features=3, pad="hw", name="conv1")(x)
        feats = 64
        mods = []
        for r in range(n_thw + n_hw):
            mode = "thw" if r < n_thw else "hw"
            mods.append((
                RefBatchNorm(features=feats, name=f"Rbn{r + 1}a"),
                Conv3D(feats, (1, 1, 1), in_features=feats,
                       name=f"Rconv{r + 1}a"),
                RefBatchNorm(features=feats, name=f"Rbn{r + 1}b"),
                Conv3D(growth, (3, 3, 3), in_features=feats, pad=mode,
                       impl="pallas" if impl == "pallas" else "xla",
                       name=f"Rconv{r + 1}b"),
                mode,
            ))
            feats += growth

        if impl == "fused" and not is_train:
            from pfnl_tpu.ops.pallas.duf_block import (
                BlockParams, dense_backbone_fused)

            blocks = []
            for bna, ca, bnb, cb, mode in mods:
                sa, oa = bna.folded()
                sb, ob_bn = bnb.folded()
                blocks.append(BlockParams(
                    sa=sa, oa=oa, wa=ca.w.reshape(ca.in_features, ca.features),
                    sb=sb, ob=sb * ca.b + ob_bn, wb=cb.w, bb=cb.b, mode=mode,
                ))
            x = dense_backbone_fused(x, blocks)
        else:
            for bna, ca, bnb, cb, mode in mods:
                t = nn.relu(bna(x, is_train))
                t = ca(t)
                t = nn.relu(bnb(t, is_train))
                t = cb(t)
                if mode == "thw":
                    x = jnp.concatenate([x, t], axis=4)
                else:
                    # temporally-VALID conv shrinks T by 2; crop x to match
                    x = jnp.concatenate([x[:, 1:-1], t], axis=4)

        x = nn.relu(RefBatchNorm(features=conv2_in, name="fbn1")(x, is_train))
        x = nn.relu(Conv3D(256, (1, 3, 3), in_features=conv2_in, pad="hw",
                           name="conv2")(x))

        r = nn.relu(Conv3D(256, (1, 1, 1), in_features=256, name="rconv1")(x))
        r = Conv3D(3 * r2, (1, 1, 1), in_features=256, name="rconv2")(r)

        f = nn.relu(Conv3D(512, (1, 1, 1), in_features=256, name="fconv1")(x))
        f = Conv3D(25 * r2, (1, 1, 1), in_features=512, name="fconv2")(f)
        b, t_out, h, w, _ = f.shape
        f = f.reshape(b, t_out, h, w, 25, r2)
        f = nn.softmax(f.astype(jnp.float32), axis=4)
        return f, r


class DUF(nn.Module):
    num_frames: int = 7
    scale: int = 4
    layers: int = 52
    conv3d_impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, is_train: bool = False):
        idx0 = self.num_frames // 2
        xc = x.astype(self.dtype)
        fx, rx = FRNet(layers=self.layers, scale=self.scale,
                       conv3d_impl=self.conv3d_impl, name="G")(xc, is_train)
        x32, rx = x.astype(jnp.float32), rx.astype(jnp.float32)
        chans = []
        for c in range(3):
            t = dyn_filter_3d(x32[:, idx0 : idx0 + 1, :, :, c], fx[:, 0], (1, 5, 5))
            t = depth_to_space(t, self.scale)  # [B,H*R,W*R,1]
            chans.append(t)
        sr = jnp.concatenate(chans, axis=3)[:, None]  # [B,1,H*R,W*R,3]
        sr = sr + depth_to_space_3d(rx, self.scale)
        return {"sr": sr}
