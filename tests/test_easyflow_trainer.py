"""Standalone EasyFlow pre-training smoke + checkpoint handoff."""

import numpy as np
import jax
import jax.numpy as jnp

from pfnl_tpu.models.vespcn import VESPCN
from pfnl_tpu.train.easyflow_trainer import EasyFlowTrainer, restore_easyflow_params

from tests.util_data import make_dataset


def test_easyflow_train_and_restore(tmp_path):
    filelist, _ = make_dataset(str(tmp_path), num_seqs=2, num_frames=8, hw=(40, 40))
    tr = EasyFlowTrainer(
        train_list=filelist,
        save_dir=str(tmp_path / "ef_ckpt"),
        num_frames=3,
        crop_size=24,
        batch_size=2,
        max_steps=4,
        subdir="truth",
    )
    params = tr.train(print_fn=lambda *a: None, save_every=4,
                      summary_every=2, image_summary_every=2)
    assert params is not None

    # observability artifacts (reference model_easyflow.py:119-129 analogue)
    import glob
    import json
    import os

    metrics = [json.loads(l) for l in
               open(tmp_path / "ef_ckpt" / "metrics.jsonl")]
    assert [m["step"] for m in metrics] == [0, 2]
    assert all(np.isfinite(m["loss"]) and np.isfinite(m["tv"]) for m in metrics)
    pngs = sorted(glob.glob(str(tmp_path / "ef_ckpt" / "summaries" / "*.png")))
    names = {os.path.basename(p).split("_", 1)[1] for p in pngs}
    assert names == {"input.png", "warp.png", "flow.png"}

    # hand the pre-trained flow to VESPCN (load_easyflow analogue)
    model = VESPCN(num_frames=3)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, 24, 24, 3))
    )
    merged = restore_easyflow_params(str(tmp_path / "ef_ckpt"), variables["params"])
    got = jax.tree.leaves(merged["easyflow"])
    want = jax.tree.leaves(params)
    assert len(got) == len(want)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
