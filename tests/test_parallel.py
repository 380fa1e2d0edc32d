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


def test_gspmd_sharded_pfnl_forward_matches(rng):
    """Full PFNL forward sharded (batch x H) via GSPMD == unsharded."""
    from pfnl_tpu.models.pfnl import PFNL
    from pfnl_tpu.parallel.spmd import sharded_forward

    model = PFNL(num_frames=3, num_blocks=1, pfrb_impl="xla",
                 nonlocal_impl="dense")
    x = jnp.asarray(rng.random((4, 3, 16, 16, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    ref = np.asarray(model.apply(variables, x)["sr"])

    mesh = make_mesh(n_data=2, n_space=4)
    fn = sharded_forward(model, variables, mesh)
    out = fn(x)
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_shard_map_dp_keeps_pallas_fast_path(rng):
    """Pure-DP shard_map forward runs the PACKED PALLAS kernels per chip
    (interpret mode on CPU) and matches the single-device XLA forward —
    multi-chip serving no longer forfeits the Pallas fast path."""
    from pfnl_tpu.models.pfnl import PFNL
    from pfnl_tpu.parallel.spmd import sharded_forward_dp

    model_pallas = PFNL(num_frames=3, num_blocks=2, pfrb_impl="pallas_pack",
                        nonlocal_impl="dense")
    model_xla = PFNL(num_frames=3, num_blocks=2, pfrb_impl="xla",
                     nonlocal_impl="dense")
    x = jnp.asarray(rng.random((8, 3, 16, 16, 3)).astype(np.float32))
    variables = model_xla.init(jax.random.PRNGKey(0), x[:1])
    ref = np.asarray(model_xla.apply(variables, x)["sr"])

    mesh = make_mesh(n_data=4, n_space=2)
    fn = sharded_forward_dp(model_pallas, variables, mesh)
    out = fn(x)
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_sharded_eval_psnr_matches(rng):
    """Eval-protocol PSNR computed from the sharded forward == unsharded
    (the multi-chip evaluation path)."""
    from pfnl_tpu.models.pfnl import PFNL
    from pfnl_tpu.parallel.spmd import sharded_forward

    model = PFNL(num_frames=3, num_blocks=1, pfrb_impl="xla",
                 nonlocal_impl="dense")
    x = jnp.asarray(rng.random((4, 3, 16, 16, 3)).astype(np.float32))
    gt = jnp.asarray(rng.random((4, 1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x[:1])

    def psnr_from(sr):
        mse = jnp.mean((jnp.asarray(sr) - gt) ** 2, axis=(1, 2, 3, 4))
        return np.asarray(10.0 * jnp.log10(1.0 / mse))

    ref = psnr_from(model.apply(variables, x)["sr"])
    mesh = make_mesh(n_data=4, n_space=2)
    got = psnr_from(sharded_forward(model, variables, mesh)(x))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_fit_with_mesh_smoke(tmp_path, rng):
    """Trainer.fit(mesh=...) runs DP training on the virtual mesh."""
    import sys
    sys.path.insert(0, "/root/repo/tests")
    from util_data import make_dataset

    from pfnl_tpu.config import preset
    from pfnl_tpu.data.manifest import load_manifest
    from pfnl_tpu.data.pipeline import TrainPipeline
    from pfnl_tpu.models.pfnl import PFNL
    from pfnl_tpu.train.trainer import Trainer

    filelist, _ = make_dataset(str(tmp_path), num_seqs=2, num_frames=4,
                               hw=(40, 40))
    cfg = preset("pfnl", in_size=8, batch_size=8, num_frames=3, reload=False,
                 train_list=filelist, save_dir=str(tmp_path / "ck"))
    tr = Trainer(cfg, model=PFNL(num_frames=3, num_blocks=1))
    seqs = load_manifest(filelist, 4)
    pipe = TrainPipeline(seqs, "single", 3, 8, 4, 8, seed=0, num_threads=1,
                         prefetch=2)
    mesh = make_mesh(n_data=8, n_space=1)
    state = tr.fit(pipe, max_steps=3, save_every=10**9, mesh=mesh,
                   print_fn=lambda *a: None)
    pipe.close()
    assert int(state.step) == 3
    assert len(jax.tree.leaves(state.params)[0].sharding.device_set) == 8


def test_predictor_mesh_matches_single_chip(rng, tmp_path):
    """Multi-chip serving: Predictor with an 8-device DP mesh writes the
    SAME PNGs as the single-chip Predictor (window-batched PFNL path and
    the VESPCN Y-recombination path)."""
    from pfnl_tpu.config import preset
    from pfnl_tpu.infer.predictor import Predictor
    from pfnl_tpu.models.pfnl import PFNL
    from pfnl_tpu.models.vespcn import VESPCN
    from pfnl_tpu.utils.image_io import imread
    import glob
    import os

    from tests.util_data import make_dataset

    _, seq_dirs = make_dataset(str(tmp_path), num_seqs=1, num_frames=9,
                               hw=(32, 32))
    mesh = make_mesh(n_data=8, n_space=1)

    for name, model, cfgname in [
        ("pfnl", PFNL(num_frames=3, num_blocks=1), "pfnl"),
        ("vespcn", VESPCN(num_frames=3), "vespcn"),
    ]:
        cfg = preset(cfgname, num_frames=3, reload=False)
        x = jnp.asarray(rng.random((1, 3, 8, 8, 3)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        single = Predictor(cfg, model, variables)
        multi = Predictor(cfg, model, variables, mesh=mesh)
        single.test_video_lr(seq_dirs[0], name=f"{name}_single")
        multi.test_video_lr(seq_dirs[0], name=f"{name}_multi")
        fs = sorted(glob.glob(os.path.join(seq_dirs[0], f"{name}_single", "*.png")))
        fm = sorted(glob.glob(os.path.join(seq_dirs[0], f"{name}_multi", "*.png")))
        assert len(fs) == len(fm) == 9
        for a, b in zip(fs, fm):
            ia, ib = imread(a).astype(np.int32), imread(b).astype(np.int32)
            # identical math per chip; allow 1 uint8 step for reduction-order
            assert np.max(np.abs(ia - ib)) <= 1, (name, a)
