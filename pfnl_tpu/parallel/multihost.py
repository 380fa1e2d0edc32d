"""Multi-host / multi-slice execution (SURVEY.md §5.8).

The reference is single-GPU with zero distributed logic
(reference main.py:10, base_model.py:198); this module is the
blueprint's multi-slice extension:

  * `initialize()` — `jax.distributed` bring-up (coordinator service,
    per-process device visibility; gloo collectives for CPU test runs);
  * `make_dp_mesh()` — a PROCESS-MAJOR device mesh: the outer span of
    the `data` axis crosses processes/slices (DCN), the inner span stays
    inside a slice (ICI).  Pure-DP gradient all-reduce then lowers to an
    ICI reduce-scatter/all-gather within each slice and one DCN
    all-reduce across slices — the §5.8 "DCN as the data-parallel outer
    axis" layout, inserted by XLA from the shardings alone;
  * `host_local_batch()` — each process feeds ONLY its local shard of
    the global batch via `jax.make_array_from_process_local_data`;
  * `replicate()` — multi-process-safe full replication (params/opt
    state) from identical host values.

Single-process usage degrades to the plain `parallel.mesh` behavior, so
the Trainer uses these helpers unconditionally when a mesh is given.
"""

import os
from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids=None,
               cpu_collectives: str = "gloo") -> None:
    """Bring up `jax.distributed`.  No-op when nothing indicates a
    multi-process run (no coordinator argument and no cluster env), so
    single-host flows never pay the coordination-service startup.  Must
    run before any other jax call touches the backend (the probe
    deliberately avoids jax.devices()/process_count()).

    On real TPU pods the three arguments can all be None (JAX autodetects
    from the TPU metadata); on CPU/GPU test clusters pass them
    explicitly.  `cpu_collectives`: cross-process collectives backend for
    the CPU platform (gloo is compiled into jaxlib; used by the
    multi-process CPU tests, tests/test_multihost.py)."""
    global _initialized
    if _initialized:
        return
    autodetect = (
        "COORDINATOR_ADDRESS" in os.environ
        or "MEGASCALE_COORDINATOR_ADDRESS" in os.environ
        # >1 worker host => a real pod (single-host TPU setups also set
        # this, e.g. TPU_WORKER_HOSTNAMES=localhost — not a cluster)
        or len(os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",")) > 1)
    if coordinator_address is None and num_processes is None and not autodetect:
        return
    try:
        jax.config.update("jax_cpu_collectives_implementation", cpu_collectives)
    except Exception:
        pass  # config knob absent in some jax versions; TPU unaffected
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True


def process_major_devices():
    """Global device list ordered (process, local id): contiguous
    per-process blocks, so a `data` axis laid over it gives every process
    a contiguous run of batch rows (its own local shard) and puts the
    process/slice dimension outermost (DCN)."""
    return sorted(jax.devices(), key=lambda d: (d.process_index, d.id))


def make_dp_mesh(n_data: Optional[int] = None, n_space: int = 1) -> Mesh:
    """(data, space) mesh over ALL processes' devices, process-major."""
    from pfnl_tpu.parallel.mesh import make_mesh

    devices = process_major_devices()
    if n_data is None:
        n_data = len(devices) // n_space
    if jax.process_count() > 1 and n_data * n_space != len(devices):
        # a partial mesh would leave some processes with zero addressable
        # devices — every collective/shard build would then fail obscurely
        raise ValueError(
            f"multi-process runs must use every device: mesh "
            f"{n_data}x{n_space} != {len(devices)} devices across "
            f"{jax.process_count()} processes")
    return make_mesh(n_data=n_data, n_space=n_space, devices=devices)


def host_local_batch(batch, mesh: Mesh):
    """Build global arrays whose leading axis is sharded over `data`,
    with THIS process contributing only its local rows.  `batch` leaves
    are host arrays of the per-process batch size
    (global_batch / process_count)."""
    def put(x):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(put, batch)


def broadcast_from_main(tree):
    """Make every process hold process 0's copy of a host pytree.
    Used after checkpoint restore: only process 0 saves, so on resume
    the other processes would otherwise keep their (divergent) init
    state and step count — make_array_from_process_local_data does NOT
    validate cross-process consistency."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return jax.device_get(multihost_utils.broadcast_one_to_all(tree))


def replicate(tree, mesh: Mesh):
    """Fully replicate host-identical values over every device of the
    mesh; safe when the mesh spans processes (device_put to
    non-addressable devices is not).  NOTE: assumes every process passes
    the SAME host values — after a restore, run broadcast_from_main
    first (Trainer.fit does)."""
    sharding = NamedSharding(mesh, P())

    def put(x):
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x))

    return jax.tree.map(put, tree)


def is_main() -> bool:
    return jax.process_index() == 0


def local_batch_size(global_batch_size: int) -> int:
    n = jax.process_count()
    assert global_batch_size % n == 0, (
        f"global batch {global_batch_size} not divisible by "
        f"{n} processes")
    return global_batch_size // n
