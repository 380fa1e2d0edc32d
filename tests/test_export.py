"""AOT export artifacts (infer/export.py): serialize -> deserialize ->
numerically identical forward, CLI round trip, and meta integrity."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pfnl_tpu.infer.export import export_model, load_exported, read_meta
from pfnl_tpu.models.pfnl import PFNL
from pfnl_tpu.models.duf import DUF


def test_export_roundtrip_pfnl(rng, tmp_path):
    m = PFNL(num_frames=3, num_blocks=2)
    x = jnp.asarray(rng.random((2, 3, 16, 16, 3), np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)

    blob = export_model(m, variables, batch=2, frames=3, hw=(16, 16))
    meta = read_meta(blob)
    assert meta["in_shape"] == [2, 3, 16, 16, 3]
    assert meta["model"] == "PFNL"

    path = os.path.join(tmp_path, "m.shlo")
    with open(path, "wb") as f:
        f.write(blob)
    fn = load_exported(path)
    ref = m.apply(variables, x)["sr"]
    out = fn(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    assert fn.meta["platforms"] == ["cpu"]


def test_export_rejects_wrong_shape(rng):
    m = PFNL(num_frames=3, num_blocks=1)
    x = jnp.asarray(rng.random((1, 3, 16, 16, 3), np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    fn = load_exported(export_model(m, variables, batch=1, frames=3, hw=(16, 16)))
    bad = jnp.zeros((2, 3, 16, 16, 3), jnp.float32)
    with pytest.raises(Exception):
        fn(bad)


def test_export_duf_with_batch_stats(rng):
    m = DUF(num_frames=7, layers=16)
    x = jnp.asarray(rng.random((1, 7, 12, 12, 3), np.float32))
    variables = m.init(jax.random.PRNGKey(0), x, is_train=False)
    blob = export_model(m, variables, batch=1, frames=7, hw=(12, 12),
                        extra_kwargs={"is_train": False})
    fn = load_exported(blob)
    ref = m.apply(variables, x, is_train=False)["sr"]
    np.testing.assert_allclose(np.asarray(fn(x)), np.asarray(ref), atol=1e-6)


def test_export_cli(rng, tmp_path, monkeypatch):
    import run
    from pfnl_tpu.config import preset
    from pfnl_tpu.train.trainer import Trainer

    # save a checkpoint the CLI can restore (step 0 init)
    cfg = preset("pfnl", in_size=8, batch_size=1, num_frames=7, reload=False,
                 save_dir=str(tmp_path / "ck"))
    tr = Trainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(0),
                          np.zeros((1, 7, 8, 8, 3), np.float32))
    tr.save(state)

    out = str(tmp_path / "pfnl.shlo")
    monkeypatch.chdir(tmp_path)
    run.main(["export", "pfnl", "--save-dir", str(tmp_path / "ck"),
              "--hw", "8x8", "--batch", "1", "--out", out])
    fn = load_exported(out)
    x = jnp.asarray(rng.random((1, 7, 8, 8, 3), np.float32))
    sr = fn(x)
    assert sr.shape == (1, 1, 32, 32, 3)
    assert np.isfinite(np.asarray(sr)).all()


def test_export_y_family_emits_rgb(rng):
    """Y-channel family artifacts are self-contained: the export bakes in
    the RGB reconstruction (SR Y + bicubic CbCr), matching the
    Predictor's serving function exactly."""
    from pfnl_tpu.models.vespcn import VESPCN
    from pfnl_tpu.infer.predictor import make_serving_fn

    m = VESPCN(num_frames=3)
    x = jnp.asarray(rng.random((2, 3, 12, 12, 3), np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    blob = export_model(m, variables, batch=2, frames=3, hw=(12, 12),
                        model_name="vespcn")
    fn = load_exported(blob)
    out = fn(x)
    assert out.shape == (2, 48, 48, 3)  # final RGB, not a Y channel
    per_chip, _ = make_serving_fn("vespcn", m, 3)
    ref = per_chip(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_read_meta_rejects_garbage():
    with pytest.raises(ValueError):
        read_meta(b"GARBAGE!" + b"\x00" * 32)
