"""End-to-end training smoke tests on synthetic data (SURVEY.md §4 (d))."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pfnl_tpu.config import preset
from pfnl_tpu.data.manifest import load_manifest
from pfnl_tpu.data.pipeline import TrainPipeline, device_augment_and_degrade
from pfnl_tpu.models.pfnl import PFNL
from pfnl_tpu.models.vespcn import VESPCN
from pfnl_tpu.train.trainer import Trainer

from tests.util_data import make_dataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    filelist, seq_dirs = make_dataset(str(root), num_seqs=2, num_frames=10, hw=(48, 48))
    return filelist, seq_dirs


def test_pipeline_shapes_and_determinism(dataset):
    filelist, _ = dataset
    seqs = load_manifest(filelist)
    kw = dict(num_frames=3, in_size=8, scale=4, batch_size=2, num_threads=1, prefetch=2)
    p1 = TrainPipeline(seqs, "single", seed=7, **kw)
    b1 = p1.get_batch()
    p1.close()
    p2 = TrainPipeline(seqs, "single", seed=7, **kw)
    b2 = p2.get_batch()
    p2.close()
    assert b1["gt"].shape == (2, 3, 32, 32, 3) and b1["gt"].dtype == np.uint8
    np.testing.assert_array_equal(b1["gt"], b2["gt"])  # fixed seed -> fixed batch


def test_pipeline_double_mode_alignment(dataset):
    """Every double-producer sample — including flipped/transposed ones —
    must satisfy downsample(gt_patch) == lr_center_patch (interior): the
    alignment the reference's flip augmentation breaks by scale-1 GT px
    (base_model.py:97-103; fixed via sample_flip_crop)."""
    from pfnl_tpu.ops.degrade import downsample

    filelist, _ = dataset
    seqs = load_manifest(filelist, need_blur=True)
    p = TrainPipeline(seqs, "double", num_frames=3, in_size=8, scale=4,
                      batch_size=2, num_threads=1, prefetch=2, seed=3)
    batches = [p.get_batch() for _ in range(4)]
    p.close()
    assert batches[0]["lr"].shape == (2, 3, 8, 8, 3)
    assert batches[0]["gt"].shape == (2, 1, 32, 32, 3)
    for b in batches:
        lr = b["lr"].astype(np.float32) / 255.0
        gt = b["gt"].astype(np.float32) / 255.0
        d = np.asarray(downsample(jnp.asarray(gt), scale=4))  # [B,1,8,8,3]
        # interior: reflect-pad edge effects reach 2 LR px into the patch
        err = np.abs(d[:, 0, 2:-2, 2:-2] - lr[:, 1, 2:-2, 2:-2]).max()
        assert err < 0.012, f"LR/GT misaligned: {err}"


def test_sample_flip_crop_geometry(rng):
    from pfnl_tpu.data.pipeline import sample_flip_crop

    saw_flip = False
    for _ in range(50):
        y0, x0, gy, gx, fy, fx, ftr = sample_flip_crop(rng, 12, 12, 8, 4)
        assert 0 <= gy and gy + 32 <= 48 and 0 <= gx and gx + 32 <= 48
        assert gy == y0 * 4 - (3 if fy else 0)
        assert gx == x0 * 4 - (3 if fx else 0)
        saw_flip |= bool(fy or fx)
    assert saw_flip
    # no margin for the shift -> flips along that axis are disabled
    for _ in range(20):
        y0, x0, gy, gx, fy, fx, ftr = sample_flip_crop(rng, 8, 12, 8, 4)
        assert not fy and y0 == 0


def test_device_augment_and_degrade_single(dataset):
    filelist, _ = dataset
    seqs = load_manifest(filelist)
    p = TrainPipeline(seqs, "single", num_frames=3, in_size=8, scale=4,
                      batch_size=2, num_threads=1, prefetch=2)
    b = p.get_batch()
    p.close()
    lr, gt = device_augment_and_degrade(
        jax.tree.map(jnp.asarray, b), jax.random.PRNGKey(0), "single", 4
    )
    assert lr.shape == (2, 3, 8, 8, 3)
    assert gt.shape == (2, 1, 32, 32, 3)
    assert float(jnp.max(lr)) <= 1.0 and float(jnp.min(lr)) >= 0.0


def _loss_decreases(losses, factor=0.9):
    first = np.mean(losses[:3])
    last = np.mean(losses[-3:])
    return last < first * factor or last < 1e-3


def test_pfnl_train_smoke(dataset, tmp_path):
    filelist, _ = dataset
    cfg = preset(
        "pfnl", in_size=8, batch_size=2, num_frames=3,
        train_list=filelist, save_dir=str(tmp_path / "ckpt"), reload=False,
        learning_rate=1e-3, host_threads=1,
    )
    model = PFNL(num_frames=3, num_blocks=2)
    tr = Trainer(cfg, workdir=str(tmp_path / "ckpt"), model=model)
    seqs = load_manifest(filelist)
    pipe = TrainPipeline(seqs, "single", num_frames=3, in_size=8, scale=4,
                         batch_size=2, num_threads=1, prefetch=2)
    losses = []
    state = tr.fit(
        pipe, max_steps=30, save_every=10**9, log_every=10**9,
        print_fn=lambda *a: None,
    )
    # run a few more collecting losses
    key = jax.random.PRNGKey(9)
    for i in range(25):
        state, l = tr.step_fn(0)(state, pipe.get_batch(), jax.random.fold_in(key, i))
        losses.append(float(l["loss"]))
    pipe.close()
    assert np.all(np.isfinite(losses))
    assert _loss_decreases(losses, factor=1.05)  # at least not diverging
    assert int(state.step) == 55


def test_vespcn_staged_training_freezes_flow(dataset, tmp_path):
    filelist, _ = dataset
    cfg = preset(
        "vespcn", in_size=8, batch_size=2,
        train_list=filelist, save_dir=str(tmp_path / "ckpt"), reload=False,
        stage_switch_step=5,
    )
    tr = Trainer(cfg, workdir=str(tmp_path / "ckpt"))
    seqs = load_manifest(filelist, need_blur=True)
    pipe = TrainPipeline(seqs, "double", num_frames=3, in_size=8, scale=4,
                         batch_size=2, num_threads=1, prefetch=2)
    b = jax.tree.map(jnp.asarray, pipe.get_batch())
    lr, _ = device_augment_and_degrade(b, jax.random.PRNGKey(0), "double", 4)
    state = tr.init_state(jax.random.PRNGKey(0), np.asarray(lr))
    flow0 = jax.device_get(state.params["easyflow"])

    # stage 0: flow params must stay frozen
    state, losses = tr.step_fn(0)(state, pipe.get_batch(), jax.random.PRNGKey(1))
    flow1 = jax.device_get(state.params["easyflow"])
    for a, c in zip(jax.tree.leaves(flow0), jax.tree.leaves(flow1)):
        np.testing.assert_array_equal(a, c)
    assert "loss_flow" in losses

    # stage 1: flow params must move
    state, _ = tr.step_fn(1)(state, pipe.get_batch(), jax.random.PRNGKey(2))
    flow2 = jax.device_get(state.params["easyflow"])
    moved = any(
        not np.array_equal(a, c)
        for a, c in zip(jax.tree.leaves(flow1), jax.tree.leaves(flow2))
    )
    pipe.close()
    assert moved


def test_checkpoint_resume_roundtrip(dataset, tmp_path):
    filelist, _ = dataset
    cfg = preset(
        "pfnl", in_size=8, batch_size=2, num_frames=3,
        train_list=filelist, save_dir=str(tmp_path / "ckpt"), reload=False,
    )
    model = PFNL(num_frames=3, num_blocks=1)
    tr = Trainer(cfg, workdir=str(tmp_path / "ckpt"), model=model)
    seqs = load_manifest(filelist)
    pipe = TrainPipeline(seqs, "single", num_frames=3, in_size=8, scale=4,
                         batch_size=2, num_threads=1, prefetch=2)
    b = jax.tree.map(jnp.asarray, pipe.get_batch())
    lr, _ = device_augment_and_degrade(b, jax.random.PRNGKey(0), "single", 4)
    state = tr.init_state(jax.random.PRNGKey(0), np.asarray(lr))
    state, _ = tr.step_fn(0)(state, pipe.get_batch(), jax.random.PRNGKey(1))
    pipe.close()
    tr.save(state)

    tr2 = Trainer(cfg, workdir=str(tmp_path / "ckpt"), model=model)
    state2 = tr2.init_state(jax.random.PRNGKey(42), np.asarray(lr))
    state2 = tr2.restore(state2)
    assert int(state2.step) == int(state.step) == 1
    for a, c in zip(jax.tree.leaves(state.params), jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_duf_legacy_checkpoint_restore(tmp_path):
    """DUF checkpoints saved BEFORE the zero_debias shadow stats existed
    (pre-r5) restore via the legacy shim: shadow-free tree -> shadows
    seeded from the moving stats (trainer._restore_legacy_bn)."""
    from pfnl_tpu.models import DUF

    cfg = preset("duf", in_size=8, batch_size=1, num_frames=7,
                 save_dir=str(tmp_path / "ck"), reload=False)
    model = DUF(num_frames=7, layers=16)
    tr = Trainer(cfg, workdir=str(tmp_path / "ck"), model=model)
    lr = np.random.default_rng(0).random((1, 7, 8, 8, 3)).astype(np.float32)
    state = tr.init_state(jax.random.PRNGKey(0), lr)

    # write an OLD-LAYOUT checkpoint: state without the shadow leaves
    def strip(tree):
        if not isinstance(tree, dict):
            return tree
        return {k: strip(v) for k, v in tree.items()
                if k not in ("biased_mean", "biased_var", "local_step")}

    mv = jax.tree.map(lambda a: np.full_like(np.asarray(a), 0.25),
                      strip(jax.device_get(state.batch_stats)))
    import orbax.checkpoint as ocp

    legacy = jax.device_get(state).replace(
        batch_stats=mv, step=np.asarray(7, np.int32))
    tr.ckpt_mgr.save(7, args=ocp.args.StandardSave(legacy))
    tr.ckpt_mgr.wait_until_finished()

    restored = tr.restore(state)
    assert int(restored.step) == 7
    bs = jax.device_get(restored.batch_stats)
    leaf = bs["G"]["fbn1"]
    np.testing.assert_array_equal(np.asarray(leaf["moving_variance"]), 0.25)
    # shadows seeded from the (already-debiased) moving stats
    np.testing.assert_array_equal(np.asarray(leaf["biased_var"]), 0.25)
    assert float(leaf["local_step"]) > 1e6
