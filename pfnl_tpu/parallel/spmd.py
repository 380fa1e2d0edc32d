"""Sharded full-model forwards (SURVEY.md §5.8, new-build).

Two multi-chip inference paths:

1. `sharded_forward` — GSPMD: annotate the INPUT sharding (batch over
   'data', image rows over 'space') on a jitted forward and let XLA's
   SPMD partitioner insert the halo exchanges for the convs and the
   collectives for the non-local attention.  The model must be ordinary
   jnp/lax code on this path (pfrb_impl='xla'): Pallas kernels are
   per-chip programs and are not GSPMD-partitionable.  Needed whenever
   the SPATIAL axis is sharded (one image too big for one chip).

2. `sharded_forward_dp` — shard_map over the batch axis only.  Each chip
   runs the FULL single-chip program on its batch shard — including the
   packed Pallas PFRB/tail kernels — so pure data-parallel serving keeps
   the ~3x Pallas fast path that GSPMD forfeits.  Batch-only sharding
   needs no halo or collective at all; `shard_map` is exactly the
   "per-chip program" escape hatch GSPMD lacks.

`parallel.nonlocal_sp` remains the hand-sharded attention alternative.
"""

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
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


def sharded_forward_dp(model, variables, mesh: Mesh):
    """Pure-DP multi-chip forward that KEEPS the Pallas fast path.

    Returns fn(x) with x's batch axis sharded over every mesh axis
    (data x space used as one flat DP axis — 'space' has no spatial role
    here); params are replicated.  Inside shard_map each chip sees its
    local [N/d, T, H, W, C] shard and runs the unmodified single-chip
    forward, Pallas kernels included.  The batch must divide the device
    count."""
    call = sharded_apply_dp(lambda v, x: model.apply(v, x)["sr"], mesh)
    return lambda x: call(variables, x, 5)


def sharded_apply_dp(per_chip, mesh: Mesh):
    """Generalized `sharded_forward_dp`: shard_map an ARBITRARY per-chip
    function `per_chip(variables, x) -> y` (x and y batch-major) over the
    flat DP axis with replicated variables.  Used by the Predictor's
    window-batched inference so multi-chip serving keeps every per-chip
    Pallas kernel AND the family-specific post-processing (e.g. the
    VESPCN Y+CbCr recombination) on device.  Returns
    call(variables, x, nd_out) — variables are a per-call argument, so a
    caller swapping checkpoints never serves stale weights."""
    axes = tuple(mesh.axis_names)
    repl = NamedSharding(mesh, P())

    jits = {}

    def call(variables, x, nd_out=5):
        key = (x.ndim, nd_out)
        if key not in jits:
            in_spec = P(axes, *([None] * (x.ndim - 1)))
            out_spec = P(axes, *([None] * (nd_out - 1)))
            smapped = shard_map(per_chip, mesh=mesh, in_specs=(P(), in_spec),
                                out_specs=out_spec, check_vma=False)
            jits[key] = jax.jit(
                smapped,
                in_shardings=(repl, NamedSharding(mesh, in_spec)),
                out_shardings=NamedSharding(mesh, out_spec),
            )
        return jits[key](variables, x)

    return call
