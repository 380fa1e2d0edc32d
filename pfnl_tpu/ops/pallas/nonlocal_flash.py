"""Fused streaming-softmax (flash) non-local attention TPU kernel.

Computes softmax(theta @ phi^T) @ g per batch element WITHOUT materializing
the [N, M] score matrix — the reference materializes it with an
unstabilized exp (utils.py:53-64; SURVEY.md §5.7 calls this kernel
"required, not optional" for test-time resolutions: UDM10 gives N=14400,
i.e. an 830 MB f32 score matrix per batch element).

Standard flash recurrence over key blocks with running (max, denom, acc)
carried in VMEM scratch across the innermost (sequential) grid dimension.
No 1/sqrt(d) scaling — the reference has none.  Mathematically identical
to the reference softmax (invariant to the max subtraction) wherever the
reference's raw exp does not overflow.

Wrapper pads N/M to block multiples and D/Dv to the 128-lane width; padded
keys are masked with -inf (mask baked at trace time — shapes are static).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float("-inf")


def _kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *, m_valid, bk, nk):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]  # [BQ, D]
    k = k_ref[0]  # [BK, D]
    v = v_ref[0]  # [BK, Dv]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, BK]
    key_idx = j * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(key_idx < m_valid, s, _NEG_INF)

    m_prev = m_ref[:]  # [BQ, 1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)  # [BQ, 1]
    p = jnp.exp(s - m_new)  # [BQ, BK]

    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = m_new

    @pl.when(j == nk - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("bq", "bk", "interpret"))
def nonlocal_flash(
    theta: jax.Array,
    phi: jax.Array,
    g: jax.Array,
    bq: int = 1024,
    bk: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """theta: [B,N,D], phi: [B,M,D], g: [B,M,Dv] -> [B,N,Dv]."""
    b, n, d = theta.shape
    m = phi.shape[1]
    dv = g.shape[-1]
    bq = min(bq, max(128, n))
    bk = min(bk, max(128, m))

    d_p = max(128, -(-d // 128) * 128)
    dv_p = max(128, -(-dv // 128) * 128)
    n_p = -(-n // bq) * bq
    m_p = -(-m // bk) * bk

    q = _pad_to(_pad_to(theta, n_p, 1), d_p, 2)
    k = _pad_to(_pad_to(phi, m_p, 1), d_p, 2)
    v = _pad_to(_pad_to(g, m_p, 1), dv_p, 2)

    nq, nk = n_p // bq, m_p // bk
    grid = (b, nq, nk)

    out = pl.pallas_call(
        functools.partial(_kernel, m_valid=m, bk=bk, nk=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d_p), lambda bi, i, j: (bi, i, 0)),
            pl.BlockSpec((1, bk, d_p), lambda bi, i, j: (bi, j, 0)),
            pl.BlockSpec((1, bk, dv_p), lambda bi, i, j: (bi, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, dv_p), lambda bi, i, j: (bi, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_p, dv_p), g.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, dv_p), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)
    return out[:, :n, :dv]
