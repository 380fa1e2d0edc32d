"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md §4 (e))."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pfnl_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from pfnl_tpu.parallel.nonlocal_sp import nonlocal_attention_sp
from pfnl_tpu.ops.nonlocal_attn import nonlocal_attention


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["space"] == 1
    mesh2 = make_mesh(n_data=4, n_space=2)
    assert mesh2.shape["data"] == 4 and mesh2.shape["space"] == 2


def test_spatial_parallel_attention_matches_dense(rng):
    mesh = make_mesh(n_data=1, n_space=8)
    theta = jnp.asarray(rng.standard_normal((2, 64, 16)).astype(np.float32))
    dense = np.asarray(nonlocal_attention(theta, theta, theta))
    sp = np.asarray(nonlocal_attention_sp(theta, theta, theta, mesh))
    np.testing.assert_allclose(sp, dense, atol=1e-5)


def test_spatial_parallel_attention_chunked_path(rng):
    mesh = make_mesh(n_data=2, n_space=4)
    theta = jnp.asarray(rng.standard_normal((1, 128, 8)).astype(np.float32))
    dense = np.asarray(nonlocal_attention(theta, theta, theta))
    sp = np.asarray(nonlocal_attention_sp(theta, theta, theta, mesh, impl="chunked"))
    np.testing.assert_allclose(sp, dense, atol=1e-5)


def test_data_parallel_train_step_matches_single_device(rng):
    """One DP train step on the 8-device mesh == the single-device step."""
    from pfnl_tpu.config import preset
    from pfnl_tpu.data.pipeline import device_augment_and_degrade
    from pfnl_tpu.models.pfnl import PFNL
    from pfnl_tpu.train.trainer import Trainer

    cfg = preset("pfnl", in_size=8, batch_size=8, num_frames=3, reload=False)
    model = PFNL(num_frames=3, num_blocks=1)
    tr = Trainer(cfg, workdir="/tmp/_dp_test", model=model)
    gt = (rng.random((8, 3, 32, 32, 3)) * 255).astype(np.uint8)
    batch = {"gt": gt}
    lr0, _ = device_augment_and_degrade(
        {"gt": jnp.asarray(gt)}, jax.random.PRNGKey(0), "single", 4
    )
    state = tr.init_state(jax.random.PRNGKey(0), np.asarray(lr0))

    # single device
    s1, l1 = tr.step_fn(0)(state, {"gt": jnp.asarray(gt)}, jax.random.PRNGKey(1))

    # 8-way DP
    tr2 = Trainer(cfg, workdir="/tmp/_dp_test2", model=model)
    state2 = tr2.init_state(jax.random.PRNGKey(0), np.asarray(lr0))
    mesh = make_mesh(n_data=8, n_space=1)
    with mesh:
        state2 = replicate(state2, mesh)
        sharded = shard_batch({"gt": jnp.asarray(gt)}, mesh)
        s2, l2 = tr2.step_fn(0)(state2, sharded, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(l1["loss"]), float(l2["loss"]), rtol=1e-5)
    a = jax.tree.leaves(jax.device_get(s1.params))
    b = jax.tree.leaves(jax.device_get(s2.params))
    for x, y in zip(a, b):
        # tiny drift allowed: the sharded grad psum reduces in another order
        np.testing.assert_allclose(x, y, atol=5e-5)
