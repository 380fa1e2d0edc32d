"""Spatially-sharded non-local attention (context parallelism over HW).

At large test resolutions the non-local block's queries can be sharded
over the mesh's 'space' axis: each device holds a query block and the
full key/value set is assembled with an ICI all-gather (SURVEY.md §5.7
rebuild equivalent (b)).  Keys/values for these models are small
(N x 84 channels), so all-gather-KV is the right layout — a ring-attention
schedule would only help if KV itself blew HBM.

Composes with the single-device kernels: each shard runs the dense /
flash attention locally on its query slice.
"""

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from pfnl_tpu.ops.nonlocal_attn import nonlocal_attention, nonlocal_attention_chunked


def nonlocal_attention_sp(
    theta: jax.Array,
    phi: jax.Array,
    g: jax.Array,
    mesh: Mesh,
    axis: str = "space",
    impl: str = "auto",
) -> jax.Array:
    """theta/phi/g: [B, N, D] replicated or sharded on N; output sharded
    like theta.  N must be divisible by the axis size."""
    b, n, d = theta.shape
    size = mesh.shape[axis]
    assert n % size == 0, f"N={n} not divisible by mesh axis {axis}={size}"

    def local(theta_blk, phi_blk, g_blk):
        # gather full K/V over the space axis (rides ICI)
        phi_all = jax.lax.all_gather(phi_blk, axis, axis=1, tiled=True)
        g_all = jax.lax.all_gather(g_blk, axis, axis=1, tiled=True)
        if impl == "chunked" or (impl == "auto" and phi_all.shape[1] > 4096):
            return nonlocal_attention_chunked(theta_blk, phi_all, g_all)
        return nonlocal_attention(theta_blk, phi_all, g_all)

    spec = P(None, axis, None)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(theta, phi, g)
