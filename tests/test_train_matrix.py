"""One optimization step for EVERY model family: loss computes, grads
flow, params move, nothing NaNs (SURVEY.md §4 (d) across the board)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pfnl_tpu.config import preset
from pfnl_tpu.data.pipeline import device_augment_and_degrade
from pfnl_tpu.models.pfnl import PFNL
from pfnl_tpu.models.vespcn import VESPCN
from pfnl_tpu.models.mcresnet import MCResNet
from pfnl_tpu.models.ltdvsr import LTDVSR
from pfnl_tpu.models.frvsr import FRVSR
from pfnl_tpu.models.drvsr import DRVSR
from pfnl_tpu.models.duf import DUF
from pfnl_tpu.train.trainer import Trainer

_CASES = [
    # (preset, model ctor, frames, in_size)
    ("pfnl", lambda: PFNL(num_frames=3, num_blocks=1), 3, 8),
    ("vespcn", lambda: VESPCN(num_frames=3), 3, 8),
    ("mcresnet", lambda: MCResNet(num_frames=5), 5, 8),
    ("ltdvsr", lambda: LTDVSR(num_frames=5), 5, 8),
    ("frvsr", lambda: FRVSR(num_frames=3, mf=8, num_blocks=1), 3, 8),
    ("drvsr", lambda: DRVSR(num_frames=3), 3, 8),
    ("duf", lambda: DUF(num_frames=7, layers=16), 7, 8),
]


def _fake_batch(rng, producer, t, in_size, scale=4, b=2):
    gt_size = in_size * scale
    if producer == "single":
        return {"gt": (rng.random((b, t, gt_size, gt_size, 3)) * 255).astype(np.uint8)}
    lr = (rng.random((b, t, in_size, in_size, 3)) * 255).astype(np.uint8)
    tg = t if producer == "frvsr" else 1
    gt = (rng.random((b, tg, gt_size, gt_size, 3)) * 255).astype(np.uint8)
    return {"lr": lr, "gt": gt}


@pytest.mark.parametrize("name,ctor,t,in_size", _CASES)
def test_one_train_step(rng, name, ctor, t, in_size, tmp_path):
    cfg = preset(name, num_frames=t, in_size=in_size, batch_size=2, reload=False)
    tr = Trainer(cfg, workdir=str(tmp_path), model=ctor())
    batch = _fake_batch(rng, cfg.producer, t, in_size)
    lr, _ = device_augment_and_degrade(
        jax.tree.map(jnp.asarray, batch), jax.random.PRNGKey(0), cfg.producer, 4
    )
    state = tr.init_state(jax.random.PRNGKey(0), np.asarray(lr))
    before = jax.tree.leaves(jax.device_get(state.params))
    state, losses = tr.step_fn(0)(state, batch, jax.random.PRNGKey(1))
    loss = float(losses["loss"])
    assert np.isfinite(loss), (name, loss)
    after = jax.tree.leaves(jax.device_get(state.params))
    moved = any(not np.array_equal(a, b) for a, b in zip(before, after))
    assert moved, f"{name}: no parameter moved"
    if cfg.stage_switch_step is not None:
        # joint stage also steps cleanly
        state, losses = tr.step_fn(1)(state, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(losses["loss"]))


@pytest.mark.parametrize("name,t,in_size",
                         [("pfnl", 3, 8), ("vespcn", 3, 8), ("duf", 7, 8)])
def test_mixed_precision_train_step(rng, name, t, in_size, tmp_path):
    """compute_dtype=bfloat16: bf16 activations, f32 params/optimizer —
    one step runs, loss finite, params stay f32 and move."""
    cfg = preset(name, num_frames=t, in_size=in_size, batch_size=2,
                 reload=False, compute_dtype="bfloat16")
    from pfnl_tpu.train.trainer import build_model

    model = build_model(cfg)
    assert model.dtype == jnp.bfloat16
    # shrink the net for CPU test speed where the ctor allows it
    if name == "pfnl":
        model = type(model)(num_frames=t, num_blocks=1, dtype=jnp.bfloat16)
    elif name == "duf":
        model = type(model)(num_frames=t, layers=16, dtype=jnp.bfloat16)
    tr = Trainer(cfg, workdir=str(tmp_path), model=model)
    batch = _fake_batch(rng, cfg.producer, t, in_size)
    lr, _ = device_augment_and_degrade(
        jax.tree.map(jnp.asarray, batch), jax.random.PRNGKey(0), cfg.producer, 4
    )
    state = tr.init_state(jax.random.PRNGKey(0), np.asarray(lr))
    for leaf in jax.tree.leaves(state.params):
        assert leaf.dtype == jnp.float32
    before = jax.tree.leaves(jax.device_get(state.params))
    state, losses = tr.step_fn(0)(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(losses["loss"])), name
    after = jax.tree.leaves(jax.device_get(state.params))
    assert any(not np.array_equal(a, b) for a, b in zip(before, after))
    for leaf in jax.tree.leaves(state.params):
        assert leaf.dtype == jnp.float32
