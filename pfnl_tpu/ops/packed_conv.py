"""Exact space-to-depth-packed rewrites of lane-starved convolutions.

TPU MXU dots want >= 128 input/output lanes; convs with 1-32 channels at
large spatial sizes (the DRVSR/FRVSR decoder tails at 720p) run 10-30x
below peak because the channel (minor/lane) dimension is nearly empty —
measured 26.8 ms for DRVSR's 5x5 32->1 @720p at batch 4 vs 2.5 ms for
the packed equivalent (scripts/packed_conv_bench.py).

The fix: run the conv on the space_to_depth(2) layout, where a [B,H,W,C]
tensor lives as [B,H/2,W/2,4C].  Every rewrite below is EXACT — the packed
kernel is a gather/scatter rearrangement of the original kernel, so the
function space, parameterization, and checkpoints are unchanged; only the
execution layout differs (same trick as PFNL's born-packed conv0 head,
models/pfnl.py).

Channel convention matches ops/shuffle.py: packed channel index =
(dy*2 + dx)*C + c  (block phase major, original channel minor).

Three builders (kernels [kh,kw,ci,co], square, stride-2 block):

  * pack_kernel_s1(k):     stride-1 SAME, packed in -> packed out.
      y = d2s(conv(s2d(x), K', SAME))  ==  conv(x, K, SAME)
  * pack_kernel_down2(k):  stride-2 SAME (even H,W), packed in -> plain out.
      conv(s2d(x), K2, pad) == conv(x, K, strides=2, SAME)
  * pack_kernel_up2(k):    flax ConvTranspose SAME stride-2,
      plain in -> packed out.
      d2s(conv(x, Ku, SAME)) == ConvTranspose(K, strides=2, SAME)(x)

All are plain gathers of the original kernel — jit-friendly, and the
packing is differentiable w.r.t. the original kernel (the adjoint is a
scatter-add back onto it), so the packed path trains identically.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _conv(x, k, padding):
    return lax.conv_general_dilated(
        x, k, (1, 1), padding, dimension_numbers=("NHWC", "HWIO", "NHWC"))


@functools.lru_cache(maxsize=None)
def _s1_plan(k: int):
    """Gather plan for stride-1 SAME, odd k: returns (K, idu, idv, mask)
    with idu/idv/mask of shape [K, K, 4, 4] (packed-tap, in-phase,
    out-phase)."""
    assert k % 2 == 1, f"stride-1 pack needs odd k, got {k}"
    h0 = (k - 1) // 2
    # block-tap extent: a = p + du - h0 for p in {0,1}, du in [0,k)
    rlo = (0 - h0) // 2          # floor division (negative-safe)
    rhi = (1 + (k - 1) - h0) // 2
    assert rlo == -rhi, "SAME block padding requires a symmetric extent"
    K = rhi - rlo + 1
    idu = np.zeros((K, K, 4, 4), np.int32)
    idv = np.zeros((K, K, 4, 4), np.int32)
    msk = np.zeros((K, K, 4, 4), np.float32)
    for p in range(2):
        for q in range(2):
            po = p * 2 + q
            for r in range(rlo, rhi + 1):
                for pp in range(2):
                    du = 2 * r + pp - p + h0
                    if not 0 <= du < k:
                        continue
                    for s in range(rlo, rhi + 1):
                        for qq in range(2):
                            dv = 2 * s + qq - q + h0
                            if not 0 <= dv < k:
                                continue
                            pi = pp * 2 + qq
                            idu[r - rlo, s - rlo, pi, po] = du
                            idv[r - rlo, s - rlo, pi, po] = dv
                            msk[r - rlo, s - rlo, pi, po] = 1.0
    return K, idu, idv, msk


def pack_kernel_s1(kern: jax.Array) -> jax.Array:
    """[k,k,ci,co] -> [K,K,4ci,4co] for the packed stride-1 SAME conv."""
    k, _, ci, co = kern.shape
    K, idu, idv, msk = _s1_plan(k)
    g = kern[idu, idv]                      # [K,K,4,4,ci,co]
    g = g * jnp.asarray(msk)[..., None, None].astype(kern.dtype)
    g = g.transpose(0, 1, 2, 4, 3, 5)       # [K,K,4,ci,4,co]
    return g.reshape(K, K, 4 * ci, 4 * co)


@functools.lru_cache(maxsize=None)
def _down2_plan(k: int):
    """Gather plan for stride-2 SAME (even input size): taps read rows
    2i+du-lo with lo=(k-2)//2; returns (K, pad, idu, idv, mask) with
    idu/idv/mask of shape [K, K, 4]."""
    lo = max(k - 2, 0) // 2
    rlo = (0 - lo) // 2
    rhi = (k - 1 - lo) // 2
    K = rhi - rlo + 1
    idu = np.zeros((K, K, 4), np.int32)
    idv = np.zeros((K, K, 4), np.int32)
    msk = np.zeros((K, K, 4), np.float32)
    for r in range(rlo, rhi + 1):
        for pp in range(2):
            du = 2 * r + pp + lo
            if not 0 <= du < k:
                continue
            for s in range(rlo, rhi + 1):
                for qq in range(2):
                    dv = 2 * s + qq + lo
                    if not 0 <= dv < k:
                        continue
                    pi = pp * 2 + qq
                    idu[r - rlo, s - rlo, pi] = du
                    idv[r - rlo, s - rlo, pi] = dv
                    msk[r - rlo, s - rlo, pi] = 1.0
    pad = (-rlo, rhi)
    return K, pad, idu, idv, msk


def pack_kernel_down2(kern: jax.Array):
    """[k,k,ci,co] -> ([K,K,4ci,co], padding) for the packed stride-2
    SAME conv (even input sizes).  Apply with
    lax.conv_general_dilated(s2d(x), K2, (1,1), padding=pad_pairs)."""
    k, _, ci, co = kern.shape
    K, pad, idu, idv, msk = _down2_plan(k)
    g = kern[idu, idv]                      # [K,K,4,ci,co]
    g = g * jnp.asarray(msk)[..., None, None].astype(kern.dtype)
    return g.reshape(K, K, 4 * ci, co), (pad, pad)


@functools.lru_cache(maxsize=None)
def _up2_plan(k: int):
    """Gather plan for flax ConvTranspose(strides=2, SAME): y[o] gets
    K[u]*x[n] with o = 2n + 2 - u (probed; holds for k in {3,4}).
    Packed: output phase p at block i reads x[i+dn] with u = 2dn + 2 - p.
    Returns (idu, idv, mask) of shape [3, 3, 4]."""
    idu = np.zeros((3, 3, 4), np.int32)
    idv = np.zeros((3, 3, 4), np.int32)
    msk = np.zeros((3, 3, 4), np.float32)
    for p in range(2):
        for dn in (-1, 0, 1):
            u = 2 * dn + 2 - p
            if not 0 <= u < k:
                continue
            for q in range(2):
                for dm in (-1, 0, 1):
                    v = 2 * dm + 2 - q
                    if not 0 <= v < k:
                        continue
                    po = p * 2 + q
                    idu[dn + 1, dm + 1, po] = u
                    idv[dn + 1, dm + 1, po] = v
                    msk[dn + 1, dm + 1, po] = 1.0
    return idu, idv, msk


def pack_kernel_up2(kern: jax.Array) -> jax.Array:
    """[k,k,ci,co] (k in {3,4}) -> [3,3,ci,4co]: the packed-output
    equivalent of flax ConvTranspose(strides=(2,2), padding='SAME')."""
    k, _, ci, co = kern.shape
    assert k in (3, 4), f"up2 pack derived for k in {{3,4}}, got {k}"
    idu, idv, msk = _up2_plan(k)
    g = kern[idu, idv]                      # [3,3,4,ci,co]
    g = g * jnp.asarray(msk)[..., None, None].astype(kern.dtype)
    g = g.transpose(0, 1, 3, 2, 4)           # [3,3,ci,4,co]
    return g.reshape(3, 3, ci, 4 * co)


def tile_bias(b: jax.Array) -> jax.Array:
    """Per-channel bias -> packed-channel bias (phase-major order)."""
    return jnp.tile(b, 4)


# --- packed execution helpers ------------------------------------------

def conv_s1_packed(xp: jax.Array, kern: jax.Array, bias=None) -> jax.Array:
    """Stride-1 SAME conv executed on the packed layout.
    xp: [B,H/2,W/2,4ci] (s2d of the logical [B,H,W,ci] input);
    kern: the ORIGINAL [k,k,ci,co] kernel.  Returns packed [B,H/2,W/2,4co]."""
    y = _conv(xp, pack_kernel_s1(kern).astype(xp.dtype), "SAME")
    if bias is not None:
        y = y + tile_bias(bias).astype(xp.dtype)
    return y


def conv_down2_packed(xp: jax.Array, kern: jax.Array, bias=None) -> jax.Array:
    """Stride-2 SAME conv on the packed layout -> PLAIN half-res output."""
    k2, pad = pack_kernel_down2(kern)
    y = _conv(xp, k2.astype(xp.dtype), pad)
    if bias is not None:
        y = y + bias.astype(xp.dtype)
    return y


def conv_up2_packed(x: jax.Array, kern: jax.Array, bias=None) -> jax.Array:
    """ConvTranspose(strides=2, SAME) with PACKED double-res output.
    x: plain [B,H,W,ci]; returns [B,H,W,4co] (s2d of the [B,2H,2W,co]
    transpose-conv output)."""
    y = _conv(x, pack_kernel_up2(kern).astype(x.dtype), "SAME")
    if bias is not None:
        y = y + tile_bias(bias).astype(x.dtype)
    return y
