"""End-to-end tests for the evaluator and the testvideo()/testvideos()
inference API on synthetic data."""

import glob
import json
import os

import numpy as np
import jax
import pytest

from pfnl_tpu.config import preset
from pfnl_tpu.eval.evaluator import Evaluator
from pfnl_tpu.eval.metrics import psnr_y_matlab, compute_ssim, psnr_from_mse
from pfnl_tpu.infer.predictor import Predictor
from pfnl_tpu.models.pfnl import PFNL
from pfnl_tpu.models.vespcn import VESPCN
from pfnl_tpu.models.frvsr import FRVSR
from pfnl_tpu.utils.image_io import imread

from tests.util_data import make_dataset


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("evaldata")
    # 20 frames so the center-15 window generator yields windows
    filelist, seq_dirs = make_dataset(str(root), num_seqs=4, num_frames=20, hw=(48, 48))
    return filelist, seq_dirs


def _variables(model, shape, **kw):
    x = np.zeros(shape, np.float32)
    return model.init(jax.random.PRNGKey(0), x, **kw)


def test_evaluator_pfnl_family(dataset, tmp_path):
    filelist, _ = dataset
    cfg = preset("pfnl", num_frames=3, eval_in_size=(8, 8), eval_batch_size=2,
                 eval_list=filelist)
    model = PFNL(num_frames=3, num_blocks=1)
    variables = _variables(model, (2, 3, 8, 8, 3))
    ev = Evaluator(cfg, model)
    log = str(tmp_path / "pfnl.txt")
    psnr, mse = ev.run(variables, step=0, log_path=log, print_fn=lambda *a: None)
    assert psnr.shape == (1,) and np.isfinite(psnr).all()
    line = open(log).read().strip()
    assert line.startswith('{"Iter": 0 , "PSNR": ')  # reference log format


def test_evaluator_vespcn_family(dataset, tmp_path):
    filelist, _ = dataset
    cfg = preset("vespcn", eval_in_size=(8, 8), eval_batch_size=2, eval_list=filelist)
    model = VESPCN(num_frames=3)
    variables = _variables(model, (2, 3, 8, 8, 3))
    ev = Evaluator(cfg, model)
    log = str(tmp_path / "vespcn.txt")
    out = ev.run(variables, step=5, log_path=log, print_fn=lambda *a: None)
    psnr, mse, ssim = out
    assert np.isfinite(psnr).all() and np.isfinite(ssim).all()
    assert '"SSIM":' in open(log).read()


def test_predictor_pfnl(dataset):
    filelist, seq_dirs = dataset
    cfg = preset("pfnl", num_frames=3)
    model = PFNL(num_frames=3, num_blocks=1)
    variables = _variables(model, (1, 3, 8, 8, 3))
    pred = Predictor(cfg, model, variables)
    pred.test_video_truth(seq_dirs[0], name="out_pfnl", part=1000)
    outs = sorted(glob.glob(os.path.join(seq_dirs[0], "out_pfnl", "*.png")))
    n_truth = len(glob.glob(os.path.join(seq_dirs[0], "truth", "*.png")))
    assert len(outs) == n_truth
    img = imread(outs[0])
    assert img.shape == (48, 48, 3)  # 12x12 LR -> x4


def test_predictor_vespcn_rgb_reconstruction(dataset):
    filelist, seq_dirs = dataset
    cfg = preset("vespcn")
    model = VESPCN(num_frames=3)
    variables = _variables(model, (1, 3, 12, 12, 3))
    pred = Predictor(cfg, model, variables)
    pred.test_video_lr(seq_dirs[1], name="out_vespcn")
    outs = sorted(glob.glob(os.path.join(seq_dirs[1], "out_vespcn", "*.png")))
    assert len(outs) == 20
    assert imread(outs[0]).shape == (48, 48, 3)  # RGB via CbCr upsampling


def test_predictor_frvsr_streaming(dataset):
    filelist, seq_dirs = dataset
    cfg = preset("frvsr")
    model = FRVSR(num_frames=3, mf=8, num_blocks=1)
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 3, 12, 12, 3), np.float32)
    )
    pred = Predictor(cfg, model, variables)
    pred.test_video_lr(seq_dirs[2], name="out_frvsr")
    outs = sorted(glob.glob(os.path.join(seq_dirs[2], "out_frvsr", "*.png")))
    assert len(outs) == 20
    assert imread(outs[0]).shape == (48, 48, 3)


def test_predictor_drvsr_one_frame_per_window(dataset):
    """DRVSR's multi-output windows deliver ONE frame each (sr[:, -1]) —
    the honest-throughput semantics (ADVICE r2) must hold in the file
    count too: one PNG per input frame."""
    from pfnl_tpu.models.drvsr import DRVSR

    filelist, seq_dirs = dataset
    cfg = preset("drvsr")
    model = DRVSR(num_frames=3)
    variables = _variables(model, (1, 3, 12, 12, 3))
    pred = Predictor(cfg, model, variables)
    pred.test_video_lr(seq_dirs[3], name="out_drvsr")
    outs = sorted(glob.glob(os.path.join(seq_dirs[3], "out_drvsr", "*.png")))
    assert len(outs) == 20
    assert imread(outs[0]).shape == (48, 48, 3)


def test_drvsr_last_only_matches_full_scan():
    """DRVSR(last_only=True) — the serving path that skips the first T-1
    decoder passes (reference saves only imgs_hr[0, -1],
    model/drvsr.py:505) — equals the full scan's final slice exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pfnl_tpu.models.drvsr import DRVSR

    model = DRVSR(num_frames=3)
    x = jnp.asarray(
        np.random.default_rng(3).random((2, 3, 12, 16, 3), np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    full = model.apply(variables, x)["sr"]
    last = model.apply(variables, x, last_only=True)["sr"]
    assert last.shape == (2, 1) + full.shape[2:]
    np.testing.assert_allclose(
        np.asarray(last[:, 0]), np.asarray(full[:, -1]), atol=1e-5)
    # param trees agree between the two init paths (checkpoint compat)
    v2 = model.init(jax.random.PRNGKey(0), x, last_only=True)
    assert jax.tree.map(lambda a: a.shape, variables) == jax.tree.map(
        lambda a: a.shape, v2)


def test_testvideos_iterates(dataset, tmp_path):
    filelist, seq_dirs = dataset
    root = os.path.dirname(seq_dirs[0])
    cfg = preset("pfnl", num_frames=3)
    model = PFNL(num_frames=3, num_blocks=1)
    variables = _variables(model, (1, 3, 8, 8, 3))
    pred = Predictor(cfg, model, variables)
    pred.testvideos(root, start=len(seq_dirs) - 1, name="out_tv")
    done = [d for d in seq_dirs if os.path.isdir(os.path.join(d, "out_tv"))]
    assert len(done) == 1  # only sequences >= start processed


def test_metrics_sanity(rng):
    a = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    assert psnr_y_matlab(a, a) == float("inf")
    b = np.clip(a.astype(int) + rng.integers(-3, 4, a.shape), 0, 255).astype(np.uint8)
    p = psnr_y_matlab(a, b)
    assert 30 < p < 60
    s = compute_ssim(a[..., 0].astype(float), a[..., 0].astype(float), l=255)
    assert s == pytest.approx(1.0)
    np.testing.assert_allclose(psnr_from_mse(np.array([0.01])), [20.0])


def test_parity_tables_tool(dataset, tmp_path):
    """dataset_table over a fake result dir (identity copies of truth)."""
    import shutil
    from pfnl_tpu.eval.tables import dataset_table

    _, seq_dirs = dataset
    root = os.path.dirname(seq_dirs[0])
    for d in seq_dirs[:2]:
        shutil.copytree(os.path.join(d, "truth"), os.path.join(d, "fakeres"),
                        dirs_exist_ok=True)
    rows = dataset_table(root, "fakeres", print_fn=lambda *a: None)
    assert rows["average"][0] == float("inf")  # identical -> inf PSNR
    assert rows["average"][1] == pytest.approx(1.0)


def test_hdf5_param_import(tmp_path, rng):
    import h5py
    import jax.numpy as jnp
    from pfnl_tpu.utils.param_io import load_hdf5_params

    params = {"G": {"conv1": {"W": jnp.zeros((3, 3, 3, 8)), "b": jnp.zeros((8,))}}}
    wnew = rng.standard_normal((3, 3, 3, 8)).astype(np.float32)
    p = str(tmp_path / "w.h5")
    with h5py.File(p, "w") as f:
        g = f.create_group("params")
        g.create_dataset("G_conv1_W", data=wnew)          # mangles to G/conv1/W
        g.create_dataset("G_missing_x", data=np.zeros(3))  # warn-and-skip
    out = load_hdf5_params(params, p, verbose=False)
    np.testing.assert_array_equal(np.asarray(out["G"]["conv1"]["W"]), wnew)
    np.testing.assert_array_equal(np.asarray(out["G"]["conv1"]["b"]), 0)


def test_evaluator_frvsr_family(dataset, tmp_path):
    from pfnl_tpu.models.frvsr import FRVSR as FRVSRModel

    filelist, _ = dataset
    cfg = preset("frvsr", num_frames=4, eval_in_size=(8, 8), eval_batch_size=2,
                 eval_list=filelist)
    model = FRVSRModel(num_frames=4, mf=8, num_blocks=1)
    variables = _variables(model, (2, 4, 8, 8, 3))
    ev = Evaluator(cfg, model)
    psnr, mse = ev.run(variables, step=0, print_fn=lambda *a: None)
    assert psnr.shape == (4,)  # per-frame PSNR vector (frvsr.py:143)
    assert np.isfinite(psnr).all()


def test_evaluator_duf_family(dataset, tmp_path):
    from pfnl_tpu.models.duf import DUF

    filelist, _ = dataset
    cfg = preset("duf", num_frames=7, eval_in_size=(8, 8), eval_batch_size=2,
                 eval_list=filelist)
    model = DUF(num_frames=7, layers=16)
    x = np.zeros((2, 7, 8, 8, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, is_train=True)
    ev = Evaluator(cfg, model)
    psnr, mse = ev.run(variables, step=0, print_fn=lambda *a: None)
    assert np.isfinite(psnr).all()


def test_predictor_duf(dataset):
    """DUF takes the is_train flag through the window-batched path."""
    from pfnl_tpu.models.duf import DUF

    _, seq_dirs = dataset
    cfg = preset("duf", num_frames=7)
    model = DUF(num_frames=7, layers=16)
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 7, 8, 8, 3), np.float32), is_train=True
    )
    pred = Predictor(cfg, model, variables)
    pred.test_video_lr(seq_dirs[3], name="out_duf", part=1000)
    outs = sorted(glob.glob(os.path.join(seq_dirs[3], "out_duf", "*.png")))
    assert len(outs) == 20
    assert imread(outs[0]).shape == (48, 48, 3)


def test_predictor_odd_size(tmp_path):
    """Odd-sized LR frames are edge-padded (the reference crashes here)."""
    from pfnl_tpu.utils.image_io import imsave as _imsave
    import numpy as _np

    d = tmp_path / "oddseq"
    (d / "blur4").mkdir(parents=True)
    (d / "truth").mkdir()
    rng = _np.random.default_rng(0)
    for t in range(6):
        _imsave(str(d / "blur4" / f"{t:04d}.png"),
                (rng.random((11, 13, 3)) * 255).astype(_np.uint8))
    cfg = preset("pfnl", num_frames=3)
    model = PFNL(num_frames=3, num_blocks=1)
    variables = _variables(model, (1, 3, 12, 14, 3))
    pred = Predictor(cfg, model, variables, batch_windows=2)
    pred.test_video_lr(str(d), name="out_odd")
    outs = sorted(glob.glob(os.path.join(str(d), "out_odd", "*.png")))
    assert len(outs) == 6
    assert imread(outs[0]).shape == (44, 52, 3)  # 11x13 * 4


def test_predictor_frvsr_chunked_matches_per_frame(dataset):
    """The scan-chunked recurrent path (one dispatch per chunk, ragged
    tail padded) produces the same PNGs regardless of chunk size."""
    filelist, seq_dirs = dataset
    cfg = preset("frvsr")
    model = FRVSR(num_frames=3, mf=8, num_blocks=1)
    variables = model.init(
        jax.random.PRNGKey(0), np.zeros((1, 3, 12, 12, 3), np.float32)
    )
    pred = Predictor(cfg, model, variables)
    lrs = np.stack([
        imread(f).astype(np.float32) / 255.0
        for f in sorted(glob.glob(os.path.join(seq_dirs[3], "blur4", "*.png")))
    ])  # 20 frames
    d = seq_dirs[3]
    from pfnl_tpu.utils.image_io import automkdir
    for sub in ("c1", "c7", "c64"):
        automkdir(os.path.join(d, sub))
    pred._run_recurrent(lrs, os.path.join(d, "c1"), chunk_frames=1)
    pred._run_recurrent(lrs, os.path.join(d, "c7"), chunk_frames=7)  # ragged tail
    pred._run_recurrent(lrs, os.path.join(d, "c64"), chunk_frames=64)  # > F
    a = [imread(f) for f in sorted(glob.glob(os.path.join(d, "c1", "*.png")))]
    b = [imread(f) for f in sorted(glob.glob(os.path.join(d, "c7", "*.png")))]
    c = [imread(f) for f in sorted(glob.glob(os.path.join(d, "c64", "*.png")))]
    assert len(a) == len(b) == len(c) == 20
    for x, y, z in zip(a, b, c):
        np.testing.assert_array_equal(x, y)
        np.testing.assert_array_equal(x, z)
