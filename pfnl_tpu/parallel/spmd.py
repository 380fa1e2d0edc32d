"""GSPMD-sharded full-model forward (SURVEY.md §5.8, new-build).

The idiomatic multi-chip inference path: annotate the INPUT sharding
(batch over 'data', image rows over 'space') on a jitted forward and let
XLA's SPMD partitioner insert the halo exchanges for the convs and the
collectives for the non-local attention.  No per-op shard_map needed —
the model is ordinary jnp/lax code on this path (use pfrb_impl='xla':
Pallas kernels are per-chip programs and are not GSPMD-partitionable;
`parallel.nonlocal_sp` remains the hand-sharded attention alternative).
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sharded_forward(model, variables, mesh: Mesh):
    """Returns fn(x) running `model.apply` with x sharded
    [batch->'data', H->'space'] and replicated params.

    x: [N, T, H, W, C]; H must divide evenly enough for GSPMD's halo
    exchange (any H works — padding is inserted by XLA)."""
    x_sharding = NamedSharding(mesh, P("data", None, "space", None, None))
    repl = NamedSharding(mesh, P())

    @functools.partial(jax.jit, in_shardings=(repl, x_sharding),
                       out_shardings=x_sharding)
    def fn(variables, x):
        return model.apply(variables, x)["sr"]

    return lambda x: fn(variables, x)
