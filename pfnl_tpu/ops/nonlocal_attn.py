"""Non-local (self-attention over all spatial positions) compute core.

The reference NonLocalBlock (utils.py:18-71) computes, per batch element,

    f = exp(theta @ phi^T)                      # [N, N], N = H*W
    y = (f / sum(f, -1)) @ g                    # nltype 0/1
or  f = relu(theta @ phi^T); y = (f / rowsum) @ g   # nltype 2

materializing the quadratic [N, N] matrix with an *unstabilized* exp
(utils.py:57-58).  Here:

  * `nonlocal_attention(..., stabilize=True)` (default) subtracts the row
    max before exp — mathematically identical output, overflow-proof.
    `stabilize=False` replicates the reference's raw exp for parity checks.
  * `nonlocal_attention_chunked` streams over key/value blocks with a
    running (max, denominator) pair — the flash-attention recurrence — so
    memory is O(N * block) instead of O(N^2).  This is the path used at
    test-time resolutions where N^2 would not fit (e.g. UDM10: N = 14400
    -> f would be 830 MB/batch-elem in f32).
  * a fused Pallas TPU kernel (pfnl_tpu.ops.pallas.nonlocal_flash) is used
    automatically for large N when running on TPU.

Inputs are [B, N, D] (already flattened from [B,H,W,C] by the caller) in
any float dtype; accumulation is f32.
"""

import jax
import jax.numpy as jnp
from jax import lax


def _dense_softmax_attention(theta, phi, g, stabilize: bool):
    f = jnp.einsum("bnd,bmd->bnm", theta, phi, preferred_element_type=jnp.float32)
    if stabilize:
        f = f - jnp.max(f, axis=-1, keepdims=True)
    f = jnp.exp(f)
    f = f / jnp.sum(f, axis=-1, keepdims=True)
    return jnp.einsum("bnm,bmd->bnd", f.astype(g.dtype), g)


def _dense_relu_attention(theta, phi, g):
    f = jnp.einsum("bnd,bmd->bnm", theta, phi, preferred_element_type=jnp.float32)
    f = jax.nn.relu(f)
    f = f / jnp.sum(f, axis=-1, keepdims=True)
    return jnp.einsum("bnm,bmd->bnd", f.astype(g.dtype), g)


def nonlocal_attention(
    theta: jax.Array,
    phi: jax.Array,
    g: jax.Array,
    mode: str = "softmax",
    stabilize: bool = True,
) -> jax.Array:
    """Dense quadratic attention. theta/phi: [B,N,D] & [B,M,D]; g: [B,M,Dv]."""
    if mode == "softmax":
        return _dense_softmax_attention(theta, phi, g, stabilize)
    if mode == "relu_mean":
        return _dense_relu_attention(theta, phi, g)
    raise ValueError(f"unknown nonlocal mode: {mode}")


def nonlocal_attention_chunked(
    theta: jax.Array,
    phi: jax.Array,
    g: jax.Array,
    block: int = 1024,
) -> jax.Array:
    """Streaming-softmax attention over key blocks (softmax mode only).

    Equivalent to `nonlocal_attention(mode="softmax", stabilize=True)` but
    never materializes [N, M]; peak temp memory is [B, N, block]."""
    b, n, d = theta.shape
    m = phi.shape[1]
    dv = g.shape[-1]
    pad = (-m) % block
    if pad:
        # padded keys are masked out via -inf scores
        phi = jnp.pad(phi, ((0, 0), (0, pad), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, pad), (0, 0)))
    nblocks = (m + pad) // block
    phi_b = phi.reshape(b, nblocks, block, d).transpose(1, 0, 2, 3)
    g_b = g.reshape(b, nblocks, block, dv).transpose(1, 0, 2, 3)
    valid = (jnp.arange(m + pad) < m).reshape(nblocks, 1, 1, block)

    theta32 = theta.astype(jnp.float32)

    def step(carry, inputs):
        acc, denom, mx = carry
        phi_i, g_i, valid_i = inputs
        s = jnp.einsum("bnd,bkd->bnk", theta32, phi_i.astype(jnp.float32))
        s = jnp.where(valid_i, s, -jnp.inf)
        new_mx = jnp.maximum(mx, jnp.max(s, axis=-1))
        scale = jnp.exp(mx - new_mx)
        p = jnp.exp(s - new_mx[..., None])
        acc = acc * scale[..., None] + jnp.einsum("bnk,bkv->bnv", p, g_i.astype(jnp.float32))
        denom = denom * scale + jnp.sum(p, axis=-1)
        return (acc, denom, new_mx), None

    # derive the init carry from the inputs (not constants) so the carry
    # type matches under shard_map's varying-axis tracking
    zero_q = theta32[..., 0] * 0.0  # [b, n]
    init = (
        zero_q[..., None] + jnp.zeros((1, 1, dv), jnp.float32),
        zero_q,
        zero_q - jnp.inf,
    )
    (acc, denom, _), _ = lax.scan(step, init, (phi_b, g_b, valid))
    return (acc / denom[..., None]).astype(g.dtype)
