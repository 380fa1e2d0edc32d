"""XLA reference implementation of the PFRB chain.

One PFRB (reference model/pfnl.py:65-71, as refactored in
pfnl_tpu.models.pfnl) is, per sample:

    i1_t  = lrelu(conv3x3(feat_t, W1) + b1)            t = 0..T-1 (shared W1)
    base  = lrelu(sum_t i1_t @ Wfuse_t + bfuse)        1x1 fusion over frames
    i2_t  = lrelu(conv3x3(i1_t, W2f) + conv3x3(base, W2b) + b2)
    out_t = feat_t + i2_t

This is the numerically-authoritative path: it is the training-crop
default (per-program Pallas overheads dominate at small spatial sizes),
the oracle the packed kernels (pfrb_pack.py / pfnl_tail.py) are tested
against, and the gradient fallback where no Pallas backward applies.
Two earlier fused-kernel generations (a manual-DMA single kernel and a
64-lane two-kernel split) were superseded by the 128-lane pair-packed
chain and removed; their measurement lineage lives in ROADMAP.md and git
history.
"""

import jax
import jax.numpy as jnp

from pfnl_tpu.ops.pallas.common import _lrelu


def pfrb_block_xla(feat, w1, b1, wfuse, bfuse, w2f, w2b, b2):
    n, t, h, w, c = feat.shape
    x = feat.reshape(n * t, h, w, c)
    conv = lambda x, k: jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    i1 = _lrelu(conv(x, w1) + b1.astype(x.dtype))
    i1_5d = i1.reshape(n, t, h, w, c)
    base = _lrelu(
        jnp.einsum("nthwc,tcd->nhwd", i1_5d, wfuse.astype(x.dtype))
        + bfuse.astype(x.dtype)
    )
    base_part = conv(base, w2b)
    frame_part = conv(i1, w2f).reshape(n, t, h, w, c)
    i2 = _lrelu(frame_part + base_part[:, None] + b2.astype(x.dtype))
    return feat + i2


def pfrb_chain_xla(feat, params_list):
    """N PFRBs in XLA.  (A frame-major variant that avoids the fusion
    einsum's internal transpose was measured SLOWER on v5e — XLA's loop of
    T small GEMMs lost more than the transpose cost — so the layout is
    kept batch-major.)"""
    for p in params_list:
        feat = pfrb_block_xla(feat, *p)
    return feat
