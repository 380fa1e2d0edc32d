"""PFNL: Progressive Fusion Video SR via Non-Local Spatio-Temporal
Correlations (ICCV 2019) — the flagship model.

Architecture parity with reference model/pfnl.py:39-80:
  x [N,7,h,w,3]
    -> frames concat to [N,h,w,21] -> space_to_depth(2) -> NonLocalBlock
       (gaussian, out=84) -> depth_to_space(2) -> residual add
    -> per-frame shared 5x5@64 conv (leaky_relu)
    -> 20 x PFRB: per-frame 3x3@64 (shared), fuse 1x1@64 over the 7-frame
       concat, per-frame 3x3@64 on concat(base, I1_i), residual add
    -> concat 7x64 -> 3x3@48 -> d2s(2) -> 3x3@12 -> d2s(2) -> +bicubic
    -> [N,1,4h,4w,3]

TPU-first implementation notes:
  * per-frame shared convs run with T folded into the batch axis — one big
    conv per layer instead of 7 small ones (the reference builds 7 conv
    nodes per layer).
  * the PFRB is algebraically refactored for the MXU (identical function
    space, no concats/transposes in the hot loop):
      - fuse conv10(concat_t I1_t) == sum_t conv10_t(I1_t), expressed as a
        single einsum over the frame axis;
      - conv2(concat(base, I1_i)) == conv2_base(base) + conv2_frame(I1_i):
        the base half is conv-ed ONCE per sample and broadcast over the 7
        frames instead of being recomputed per frame (the reference
        recomputes it 7x inside the concat, model/pfnl.py:69-70) — a 28%
        FLOP cut at identical outputs for suitably-merged weights.
    Kernel initializers are variance-matched to the reference's
    xavier-on-concatenated-kernel so training statistics are preserved.
  * bicubic upsampling of the center frame is the matmul-based resize
    (ops/resize.py) with the TF1-legacy mapping.
"""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from pfnl_tpu.models.blocks import (ConvParams, NonLocalBlock, leaky_relu,
                                    xavier_uniform)
from pfnl_tpu.ops.pallas.pfrb_xla import pfrb_chain_xla
from pfnl_tpu.ops.pallas.pfnl_tail import (blocks_and_tail_pack,
                                           blocks_and_tail_prepacked)
from pfnl_tpu.ops.pallas.pfrb_pack import conv0_packed, pfrb_chain_pack
from pfnl_tpu.ops.shuffle import space_to_depth, depth_to_space
from pfnl_tpu.ops.resize import resize_bicubic


def _xavier_with_fans(fan_in: int, fan_out: int):
    """Glorot-uniform with EXPLICIT fans — used for kernels that are
    mathematical slices of the reference's larger concatenated kernels, so
    the init distribution matches the unsplit parameterization."""
    limit = float(np.sqrt(6.0 / (fan_in + fan_out)))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -limit, limit)

    return init


class PFNL(nn.Module):
    num_frames: int = 7
    scale: int = 4
    mf: int = 64
    num_blocks: int = 20
    nonlocal_impl: str = "auto"
    pfrb_impl: str = "auto"  # "auto" | "pallas_pack" | "pallas_chain" | "xla"
    head_impl: str = "auto"  # "auto" | "per_frame" | "blockdiag" | "packed"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, t, h, w, c = x.shape
        assert t == self.num_frames, f"expected {self.num_frames} frames, got {t}"
        mf = self.mf
        act = leaky_relu
        xc = x.astype(self.dtype)

        # --- non-local residual over the frame-concat image ---
        inp0 = xc.transpose(0, 2, 3, 1, 4).reshape(n, h, w, t * c)  # [N,h,w,21]
        inp1 = space_to_depth(inp0, 2)
        inp1 = NonLocalBlock(
            out_channels=c * t * 4,
            sub_sample=1,
            nltype=1,
            impl=self.nonlocal_impl,
            dtype=self.dtype,
            name="nlblock_0",
        )(inp1)
        inp1 = depth_to_space(inp1, 2)
        inp0 = inp0 + inp1

        # shared 5x5 conv0 across frames (params at the same tree position
        # as an nn.Conv submodule; execution strategy is selectable)
        k0, b0 = ConvParams((5, 5, c, mf), xavier_uniform(), name="conv0")()

        impl = self.pfrb_impl
        if impl == "auto":
            # pair-packed two-kernel path on TPU for large frames; XLA for
            # small (training-crop) spatial sizes where per-program
            # overheads dominate, and everywhere off-TPU
            big = h * w >= 96 * 96
            impl = "pallas_pack" if (jax.default_backend() == "tpu" and big) else "xla"

        head = self.head_impl
        if head == "auto":
            # when the fused packed chain consumes conv0's output, emit it
            # born-packed: neither the unpacked [N*T,H,W,64] activation nor
            # the pad_to_pack relayout pass ever exists
            head = "packed" if (impl == "pallas_pack" and w % 2 == 0) else "per_frame"
        if head == "packed" and (impl != "pallas_pack" or w % 2 != 0):
            raise ValueError(
                f"head_impl='packed' needs pfrb_impl='pallas_pack' and even "
                f"width (got impl={impl}, w={w})")
        feat = packed0 = None
        if head == "packed":
            frames = inp0.reshape(n, h, w, t, c).transpose(0, 3, 1, 2, 4)
            packed0 = conv0_packed(frames, k0.astype(self.dtype), b0)
        elif head == "blockdiag":
            # one conv on the [N,h,w,t*c] frame-concat tensor with a
            # block-diagonal [5,5,t*c,t*mf] kernel: 7x the FLOPs of the
            # per-frame conv but a 448-lane MXU dot (the 64-lane per-frame
            # dot is issue-bound) and no per-frame refold transposes.
            wblk = jnp.zeros((5, 5, t * c, t * mf), self.dtype)
            for f in range(t):
                wblk = wblk.at[:, :, f * c:(f + 1) * c,
                               f * mf:(f + 1) * mf].set(k0.astype(self.dtype))
            o = jax.lax.conv_general_dilated(
                inp0, wblk, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            o = act(o + jnp.tile(b0.astype(self.dtype), (t,)))
            feat = o.reshape(n, h, w, t, mf).transpose(0, 3, 1, 2, 4)
            feat = feat.reshape(n * t, h, w, mf)
        else:
            # fold T into batch: [N*t, h, w, c], one big conv
            frames = inp0.reshape(n, h, w, t, c).transpose(0, 3, 1, 2, 4)
            frames = frames.reshape(n * t, h, w, c)
            o = jax.lax.conv_general_dilated(
                frames, k0.astype(frames.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            feat = act(o + b0.astype(frames.dtype))

        bic = resize_bicubic(xc[:, t // 2], (h * self.scale, w * self.scale))

        # fans of the reference's concatenated kernels
        conv1_fans = (9 * mf, 9 * mf)                 # 3x3 over [.., mf]
        fuse_fans = (t * mf, mf)                      # 1x1 over [.., t*mf]
        conv2_fans = (9 * 2 * mf, 9 * mf)             # 3x3 over [.., 2*mf]

        chain_fn = {
            "xla": pfrb_chain_xla,
            "pallas_chain": pfrb_chain_pack,   # packed chain + XLA tail
            "pallas_pack": None,  # handled by the fused branch below
        }[impl]

        params_list = []
        for i in range(self.num_blocks):
            w1 = self.param(f"conv1_{i}_kernel", _xavier_with_fans(*conv1_fans),
                            (3, 3, mf, mf))
            b1 = self.param(f"conv1_{i}_bias", nn.initializers.zeros, (mf,))
            wfuse = self.param(f"conv10_{i}_kernel", _xavier_with_fans(*fuse_fans),
                               (t, mf, mf))
            bfuse = self.param(f"conv10_{i}_bias", nn.initializers.zeros, (mf,))
            w2f = self.param(f"conv2f_{i}_kernel", _xavier_with_fans(*conv2_fans),
                             (3, 3, mf, mf))
            w2b = self.param(f"conv2b_{i}_kernel", _xavier_with_fans(*conv2_fans),
                             (3, 3, mf, mf))
            b2 = self.param(f"conv2f_{i}_bias", nn.initializers.zeros, (mf,))
            params_list.append((w1, b1, wfuse, bfuse, w2f, w2b, b2))

        # merge-head params (explicit so both the XLA path and the fused
        # packed blocks+tail kernel share them)
        wm1 = self.param("convmerge1_kernel", xavier_uniform(), (3, 3, t * mf, 48))
        bm1 = self.param("convmerge1_bias", nn.initializers.zeros, (48,))
        km2 = self.param("convmerge2_kernel", xavier_uniform(), (3, 3, 12, 12))
        bm2 = self.param("convmerge2_bias", nn.initializers.zeros, (12,))

        if head == "packed":
            # born-packed path: conv0 -> blocks -> merge tail, all on the
            # packed layout; no relayout pass anywhere in between
            out = blocks_and_tail_prepacked(
                packed0, params_list, wm1, bm1, km2, bm2, t, h, w)
        elif impl == "pallas_pack":
            feat_in = feat.reshape(n, t, h, w, mf)
            # fused path: blocks + merge tail never leave the packed layout
            out = blocks_and_tail_pack(feat_in, params_list, wm1, bm1, km2, bm2)
        else:
            feat_in = feat.reshape(n, t, h, w, mf)
            feat5 = chain_fn(feat_in, params_list)
            merge = feat5.transpose(0, 2, 3, 1, 4).reshape(n, h, w, t * mf)
            cv = lambda x, k, b: jax.lax.conv_general_dilated(
                x, k.astype(x.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b.astype(x.dtype)
            merge = act(cv(merge, wm1, bm1))
            large1 = depth_to_space(merge, 2)
            out1 = cv(large1, km2, bm2)  # no activation (pfnl.py:53)
            out = depth_to_space(out1, 2)

        sr = (out + bic).astype(jnp.float32)
        return {"sr": sr[:, None]}  # [N,1,H,W,3]
