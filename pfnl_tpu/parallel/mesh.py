"""Device-mesh construction and sharding rules (SURVEY.md §5.8).

The reference is single-GPU with zero distributed logic; this layer is the
TPU-native replacement: a `jax.sharding.Mesh` whose axes are

  data   batch-parallel training/inference (ICI all-reduce of grads is
         inserted by XLA from the shardings — no hand-written collectives)
  space  spatial parallelism for the quadratic non-local attention at
         large test resolutions (pfnl_tpu.parallel.nonlocal_sp)

These ~3M-param models need no tensor/pipeline parallelism for capacity —
pure DP saturates ICI-connected chips; `space` exists for the O(N^2)
attention memory, not FLOPs.
"""

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_space: int = 1,
              devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_space
    assert n_data * n_space <= len(devices), (
        f"need {n_data}x{n_space} devices, have {len(devices)}"
    )
    arr = np.array(devices[: n_data * n_space]).reshape(n_data, n_space)
    return Mesh(arr, ("data", "space"))


def shard_batch(batch, mesh: Mesh):
    """Place a host batch with the leading axis sharded over 'data'."""
    def put(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params/opt state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
