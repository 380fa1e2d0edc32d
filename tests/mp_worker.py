"""Worker for the multi-process CPU train-step test (SURVEY.md §5.8).

Each process feeds ONLY its local shard of a deterministic global batch
(jax.make_array_from_process_local_data); the jitted Trainer step runs
over a process-major (data, space) mesh spanning both processes, with
the gradient all-reduce riding the gloo cross-process collectives.
Process 0 writes the resulting losses; the parent test compares them to
a plain single-process (mesh=None) run of the same global batch.

Usage: mp_worker.py <pid> <nprocs> <port> <outfile>
  nprocs=1 -> no jax.distributed, no mesh (the reference run).
"""

import json
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main(pid: int, nprocs: int, port: int, outfile: str):
    from pfnl_tpu.parallel import multihost

    if nprocs > 1:
        multihost.initialize(f"localhost:{port}", num_processes=nprocs,
                             process_id=pid)
        assert jax.process_count() == nprocs

    import jax.numpy as jnp
    from pfnl_tpu.config import preset
    from pfnl_tpu.data.pipeline import device_augment_and_degrade
    from pfnl_tpu.models import PFNL
    from pfnl_tpu.train.trainer import Trainer

    cfg = preset("pfnl", in_size=8, batch_size=8,
                 save_dir=f"{outfile}.ck{pid}", num_frames=3)
    tr = Trainer(cfg, model=PFNL(num_frames=3, num_blocks=2))

    rng = np.random.default_rng(0)
    gt_global = rng.integers(0, 256, (8, 3, 32, 32, 3), dtype=np.uint8)
    local = gt_global[pid * 8 // nprocs:(pid + 1) * 8 // nprocs]

    lr0, _ = device_augment_and_degrade(
        {"gt": jnp.asarray(local)}, jax.random.PRNGKey(0), "single",
        cfg.scale)
    state = tr.init_state(jax.random.PRNGKey(cfg.seed), np.asarray(lr0))

    if nprocs > 1:
        mesh = multihost.make_dp_mesh()
        assert mesh.devices.size == 4 * nprocs
        state = multihost.replicate(jax.device_get(state), mesh)
        batch = multihost.host_local_batch({"gt": local}, mesh)
    else:
        batch = {"gt": jnp.asarray(local)}

    step = tr.step_fn(0)
    losses = []
    for i in range(3):
        state, out = step(state, batch, jax.random.PRNGKey(42 + i))
        losses.append(float(out["loss"]))
    if pid == 0:
        with open(outfile, "wt") as f:
            json.dump({"losses": losses,
                       "nprocs": nprocs,
                       "process_count": jax.process_count()}, f)
    print(f"worker {pid}/{nprocs} done: {losses}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
