"""Dataset preparation tooling (pfnl_tpu/data/prepare.py)."""

import glob
import os

import numpy as np

from util_data import make_dataset


def test_prepare_renders_blur_and_filelists(tmp_path):
    import jax.numpy as jnp

    from pfnl_tpu.data.prepare import make_filelists, prepare_dataset
    from pfnl_tpu.ops.degrade import downsample_4d
    from pfnl_tpu.utils.image_io import imread

    root = str(tmp_path / "ds")
    make_dataset(root, num_seqs=3, num_frames=4, hw=(24, 24))
    # drop the helper's pre-rendered LR so prepare does the work
    import shutil

    for d in glob.glob(os.path.join(root, "seq_*", "blur4")):
        shutil.rmtree(d)

    n = prepare_dataset(root, scale=4, print_fn=lambda *a: None)
    assert n == 12
    seqs = sorted(glob.glob(os.path.join(root, "seq_*")))
    for seq in seqs:
        lrs = sorted(glob.glob(os.path.join(seq, "blur4", "*.png")))
        truths = sorted(glob.glob(os.path.join(seq, "truth", "*.png")))
        assert len(lrs) == len(truths) == 4
        # bit-match against the degradation op (uint8 round-trip)
        gt = imread(truths[0]).astype(np.float32) / 255.0
        want = np.asarray(downsample_4d(jnp.asarray(gt[None]), scale=4))[0]
        want = np.clip(np.round(want * 255.0), 0, 255).astype(np.uint8)
        got = imread(lrs[0])
        assert got.shape == (6, 6, 3)
        np.testing.assert_array_equal(got, want)

    # idempotent (no overwrite by default)
    assert prepare_dataset(root, scale=4, print_fn=lambda *a: None) == 0

    tr, va = make_filelists(root, val_count=1, print_fn=lambda *a: None)
    train_lines = open(tr).read().split()
    val_lines = open(va).read().split()
    assert len(train_lines) == 2 and len(val_lines) == 1
    assert val_lines[0] == seqs[-1]


def test_parity_table_from_results(tmp_path):
    from pfnl_tpu.eval.tables import dataset_table
    from pfnl_tpu.utils.image_io import imread, imsave

    root = str(tmp_path / "ds")
    make_dataset(root, num_seqs=2, num_frames=3, hw=(16, 16))
    rng = np.random.default_rng(0)
    for seq in sorted(glob.glob(os.path.join(root, "seq_*"))):
        os.makedirs(os.path.join(seq, "res"), exist_ok=True)
        for p in glob.glob(os.path.join(seq, "truth", "*.png")):
            img = imread(p).astype(np.int32)
            noisy = np.clip(img + rng.integers(-3, 4, img.shape), 0, 255)
            imsave(os.path.join(seq, "res", os.path.basename(p)),
                   noisy.astype(np.uint8))
    rows = dataset_table(root, "res", print_fn=lambda *a: None)
    assert "average" in rows and 30 < rows["average"][0] < 60
