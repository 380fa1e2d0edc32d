"""Sub-pixel (pixel-shuffle) rearrangements.

Two distinct layouts exist in the reference and both must be preserved:

  * `depth_to_space`/`space_to_depth`: TF-NHWC semantics
    (used by PFNL model/pfnl.py:57-59,76-78, FRVSR model/frvsr.py:102,
    LTDVSR model/ltdvsr.py:108-110, DUF model/dufvsr.py:51).
  * `pixel_shuffle_legacy` (`_PS`, modules/ps.py:3-15): an ESPCN-era
    split/concat/reshape with a DIFFERENT channel->pixel mapping, used by
    VESPCN (model/vespcn.py:96-99) and MCResNet (model/mcresnet.py:108-111).

These are pure reshape/transpose ops; XLA fuses them into neighbours.
"""

import jax
import jax.numpy as jnp


def depth_to_space(x: jax.Array, r: int) -> jax.Array:
    """[N,H,W,C*r*r] -> [N,H*r,W*r,C], TF NHWC semantics:
    out[n, h*r+dy, w*r+dx, c] = in[n, h, w, (dy*r+dx)*C + c]."""
    n, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(n, h, w, r, r, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * r, w * r, c)


def space_to_depth(x: jax.Array, r: int) -> jax.Array:
    """[N,H*r,W*r,C] -> [N,H,W,C*r*r], inverse of depth_to_space."""
    n, hr, wr, c = x.shape
    h, w = hr // r, wr // r
    x = x.reshape(n, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h, w, r * r * c)


def depth_to_space_3d(x: jax.Array, r: int) -> jax.Array:
    """[N,T,H,W,C*r*r] -> [N,T,H*r,W*r,C] by folding T into batch
    (reference utils.py:320-328)."""
    n, t, h, w, c = x.shape
    y = depth_to_space(x.reshape(n * t, h, w, c), r)
    return y.reshape(n, t, y.shape[1], y.shape[2], y.shape[3])


def pixel_shuffle_legacy(x: jax.Array, r: int, n_out: int) -> jax.Array:
    """The `_PS` shuffle of modules/ps.py:3-15: split C into r groups,
    concat along W, reshape to [N, H*r, W*r, n_out].

    Algebraically this split/concat/reshape is IDENTICAL to TF
    depth_to_space (tests/test_ops_color_shuffle.py proves it against a
    literal transcription); kept as a named entry point for parity with
    the reference's API surface."""
    n, h, w, c = x.shape
    assert c == r * r * n_out, f"_PS: C={c} != r^2*n_out={r*r*n_out}"
    parts = jnp.split(x, r, axis=3)          # r x [N,H,W,r*n_out]
    xr = jnp.concatenate(parts, axis=2)      # [N,H,W*r,r*n_out]
    return xr.reshape(n, r * h, r * w, n_out)


def zero_upsampling(x: jax.Array, scale: int) -> jax.Array:
    """Insert zeros between pixels (reference modules/videosr_ops.py:23-37).
    Supports [N,H,W,C] and [N,T,H,W,C]."""
    if x.ndim == 5:
        n, t, h, w, c = x.shape
        y = jnp.concatenate([x] + [jnp.zeros_like(x)] * (scale * scale - 1), axis=-1)
        y = y.reshape(n, t, h, w, scale, scale, c)
        y = y.transpose(0, 1, 2, 4, 3, 5, 6)
        return y.reshape(n, t, h * scale, w * scale, c)
    n, h, w, c = x.shape
    y = jnp.concatenate([x] + [jnp.zeros_like(x)] * (scale * scale - 1), axis=-1)
    y = y.reshape(n, h, w, scale, scale, c)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(n, h * scale, w * scale, c)


def channel2sub(x: jax.Array, scale: int) -> jax.Array:
    """Channels -> sub-pixel positions (reference modules/videosr_ops.py:228-246).
    [.., H, W, C*s*s] -> [.., H*s, W*s, C] with (dy, dx) taken from the
    LEADING channel factor (differs from depth_to_space's ordering)."""
    lead = x.shape[:-3]
    h, w, c = x.shape[-3:]
    out_c = c // (scale * scale)
    y = x.reshape(lead + (h, w, scale, scale, out_c))
    nd = len(lead)
    perm = tuple(range(nd)) + (nd, nd + 2, nd + 1, nd + 3, nd + 4)
    y = y.transpose(perm)
    return y.reshape(lead + (h * scale, w * scale, out_c))


def sub2channel(x: jax.Array, scale: int) -> jax.Array:
    """Inverse of channel2sub (reference modules/videosr_ops.py:249-265)."""
    lead = x.shape[:-3]
    hs, ws, c = x.shape[-3:]
    h, w = hs // scale, ws // scale
    y = x.reshape(lead + (h, scale, w, scale, c))
    nd = len(lead)
    perm = tuple(range(nd)) + (nd, nd + 2, nd + 1, nd + 3, nd + 4)
    y = y.transpose(perm)
    return y.reshape(lead + (h, w, scale * scale * c))
