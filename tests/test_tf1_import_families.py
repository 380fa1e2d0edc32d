"""TF1 importers for the six non-PFNL families, validated end-to-end:
reference-named arrays -> real TF-written TensorBundle -> importer ->
flax forward == the family's numpy golden oracle.

Mirrors tests/test_tf1_import.py's PFNL recipe (VERDICT round-2 item 1).
Reference variable naming cited in pfnl_tpu/utils/tf1_imports.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_tf1_import import _write_ckpt

pytestmark = pytest.mark.tf
from test_golden_models import (  # noqa: E402
    drvsr_oracle, duf_oracle, frvsr_first_step_oracle, ltdvsr_oracle,
    mcresnet_oracle, vespcn_oracle,
)


def _W(rng):
    def W(*shape, s=0.1):
        return (rng.standard_normal(shape) * s).astype(np.float32)
    return W


def _easyflow_tf_vars(W):
    """EASYFLOW slim variables (modules/model_easyflow.py:81-98)."""
    shapes = {
        "c1": (5, 5, 2, 24), "c2": (3, 3, 24, 24), "c3": (5, 5, 24, 24),
        "c4": (3, 3, 24, 24), "c5": (3, 3, 24, 32),
        "s1": (5, 5, 5, 24), "s2": (3, 3, 24, 24), "s3": (3, 3, 24, 24),
        "s4": (3, 3, 24, 24), "s5": (3, 3, 24, 8),
    }
    tf_vars = {}
    for l, sh in shapes.items():
        tf_vars[f"easyflow/{l}/weights"] = W(*sh)
        tf_vars[f"easyflow/{l}/biases"] = W(sh[-1])
    return tf_vars


def _easyflow_oracle_p(tf_vars):
    return {
        f"{l}{a}": tf_vars[f"easyflow/{l}/{n}"]
        for l in ("c1", "c2", "c3", "c4", "c5", "s1", "s2", "s3", "s4", "s5")
        for a, n in (("k", "weights"), ("b", "biases"))
    }


def _apply(model, params, x, **kw):
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), params)
    return np.asarray(model.apply({"params": params},
                                  jnp.asarray(x, jnp.float32), **kw)["sr"])


def test_import_vespcn(tmp_path):
    from pfnl_tpu.models.vespcn import VESPCN
    from pfnl_tpu.utils.tf1_imports import import_vespcn_tf1

    rng = np.random.default_rng(11)
    W = _W(rng)
    t, h, w = 3, 8, 8
    tf_vars = _easyflow_tf_vars(W)
    tf_vars.update({
        "srmodel/enc1/weights": W(5, 5, t, 24), "srmodel/enc1/biases": W(24),
        "srmodel/enc1/alpha": W(24, s=0.3),
        "srmodel/conv6/weights": W(3, 3, 24, 16),
        "srmodel/conv6/biases": W(16), "srmodel/conv6/alpha": W(16, s=0.3),
        "srmodel/rnn_out/weights": W(3, 3, 4, 4),
        "srmodel/rnn_out/biases": W(4),
        # optimizer slots must be ignored
        "srmodel/enc1/weights/Adam": W(5, 5, t, 24),
        "global_step": np.asarray(500000, np.int64),
    })
    for i in range(9):
        tf_vars[f"srmodel/enc2_{i}/weights"] = W(3, 3, 24, 24)
        tf_vars[f"srmodel/enc2_{i}/biases"] = W(24)
        tf_vars[f"srmodel/enc2_{i}/alpha"] = W(24, s=0.3)
    prefix = str(tmp_path / "vespcn.ckpt")
    _write_ckpt(prefix, tf_vars)

    params = import_vespcn_tf1(prefix, num_frames=t)

    p = _easyflow_oracle_p(tf_vars)
    p.update(e1k=tf_vars["srmodel/enc1/weights"],
             e1b=tf_vars["srmodel/enc1/biases"],
             c6k=tf_vars["srmodel/conv6/weights"],
             c6b=tf_vars["srmodel/conv6/biases"],
             rok=tf_vars["srmodel/rnn_out/weights"],
             rob=tf_vars["srmodel/rnn_out/biases"],
             alphas=[tf_vars["srmodel/enc1/alpha"]]
             + [tf_vars[f"srmodel/enc2_{i}/alpha"] for i in range(9)]
             + [tf_vars["srmodel/conv6/alpha"]])
    for i in range(9):
        p[f"e2k{i}"] = tf_vars[f"srmodel/enc2_{i}/weights"]
        p[f"e2b{i}"] = tf_vars[f"srmodel/enc2_{i}/biases"]

    x = np.random.default_rng(1).random((1, t, h, w, 3))
    want = vespcn_oracle(x, p, t=t)
    got = _apply(VESPCN(num_frames=t), params, x)[:, 0]
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_import_mcresnet(tmp_path):
    from pfnl_tpu.models.mcresnet import MCResNet
    from pfnl_tpu.utils.tf1_imports import import_mcresnet_tf1

    rng = np.random.default_rng(12)
    W = _W(rng)
    t, h, w = 5, 8, 8
    idx0 = t // 2
    tf_vars = _easyflow_tf_vars(W)
    for d in range(idx0 + 1):
        tf_vars[f"srmodel/enc1_{d}/weights"] = W(5, 5, 1, 64)
        tf_vars[f"srmodel/enc1_{d}/biases"] = W(64)
        tf_vars[f"srmodel/enc1_{d}/alpha"] = W(64, s=0.3)
    tf_vars["srmodel/enc2_0/weights"] = W(3, 3, 64 * t, 32)
    tf_vars["srmodel/enc2_0/biases"] = W(32)
    tf_vars["srmodel/enc2_0/alpha"] = W(32, s=0.3)
    for i in range(1, 9):
        tf_vars[f"srmodel/enc2_{i}/weights"] = W(3, 3, 32, 32)
        tf_vars[f"srmodel/enc2_{i}/biases"] = W(32)
        tf_vars[f"srmodel/enc2_{i}/alpha"] = W(32, s=0.3)
    tf_vars.update({
        "srmodel/conv6/weights": W(3, 3, 32, 16),
        "srmodel/conv6/biases": W(16), "srmodel/conv6/alpha": W(16, s=0.3),
        "srmodel/rnn_out/weights": W(3, 3, 4, 4),
        "srmodel/rnn_out/biases": W(4),
    })
    prefix = str(tmp_path / "mcresnet.ckpt")
    _write_ckpt(prefix, tf_vars)

    params = import_mcresnet_tf1(prefix, num_frames=t)

    p = _easyflow_oracle_p(tf_vars)
    for d in range(idx0 + 1):
        p[f"d{d}k"] = tf_vars[f"srmodel/enc1_{d}/weights"]
        p[f"d{d}b"] = tf_vars[f"srmodel/enc1_{d}/biases"]
    # the TF graph SHARES the prelu slope per temporal distance
    p["ea"] = [tf_vars[f"srmodel/enc1_{abs(i - idx0)}/alpha"] for i in range(t)]
    p["ra"] = [tf_vars[f"srmodel/enc2_{i}/alpha"] for i in range(9)]
    for i in range(9):
        p[f"r{i}k"] = tf_vars[f"srmodel/enc2_{i}/weights"]
        p[f"r{i}b"] = tf_vars[f"srmodel/enc2_{i}/biases"]
    p.update(c6k=tf_vars["srmodel/conv6/weights"],
             c6b=tf_vars["srmodel/conv6/biases"],
             c6a=tf_vars["srmodel/conv6/alpha"],
             rok=tf_vars["srmodel/rnn_out/weights"],
             rob=tf_vars["srmodel/rnn_out/biases"])

    x = np.random.default_rng(2).random((1, t, h, w, 3))
    want = mcresnet_oracle(x, p, t=t)
    got = _apply(MCResNet(num_frames=t), params, x)[:, 0]
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_import_ltdvsr(tmp_path):
    from pfnl_tpu.models.ltdvsr import LTDVSR
    from pfnl_tpu.utils.tf1_imports import import_ltdvsr_tf1

    rng = np.random.default_rng(13)
    W = _W(rng)
    t, h, w, r2 = 5, 8, 8, 16
    tf_vars = {
        "flow/conv0/kernel": W(9, 9, 2, 32), "flow/conv0/bias": W(32),
        "flow/conv1/kernel": W(9, 9, 32, 32), "flow/conv1/bias": W(32),
        "flow/conv2/kernel": W(3, 3, 32, 2), "flow/conv2/bias": W(2),
        "ltdvsr/tem0/kernel": W(5, 5, t, 32), "ltdvsr/tem0/bias": W(32),
        "ltdvsr/tem1/kernel": W(5, 5, 32, 16), "ltdvsr/tem1/bias": W(16),
        "ltdvsr/tem2/kernel": W(5, 5, 16, 3), "ltdvsr/tem2/bias": W(3),
    }
    for b in range(3):
        cin = 2 * b + 1
        tf_vars[f"ltdvsr/conv{b}_0/kernel"] = W(5, 5, cin, 64)
        tf_vars[f"ltdvsr/conv{b}_0/bias"] = W(64)
        tf_vars[f"ltdvsr/conv{b}_1/kernel"] = W(3, 3, 64, 64)
        tf_vars[f"ltdvsr/conv{b}_1/bias"] = W(64)
        tf_vars[f"ltdvsr/conv{b}_3/kernel"] = W(3, 3, 64, 64)
        tf_vars[f"ltdvsr/conv{b}_3/bias"] = W(64)
        tf_vars[f"ltdvsr/conv{b}_2/kernel"] = W(3, 3, 64, r2)
        tf_vars[f"ltdvsr/conv{b}_2/bias"] = W(r2)
    prefix = str(tmp_path / "ltdvsr.ckpt")
    _write_ckpt(prefix, tf_vars)

    params = import_ltdvsr_tf1(prefix, num_frames=t)

    p = {}
    for j in range(3):
        p[f"fk{j}"] = tf_vars[f"flow/conv{j}/kernel"]
        p[f"fb{j}"] = tf_vars[f"flow/conv{j}/bias"]
        p[f"tk{j}"] = tf_vars[f"ltdvsr/tem{j}/kernel"]
        p[f"tb{j}"] = tf_vars[f"ltdvsr/tem{j}/bias"]
    for b in range(3):
        for l in range(4):
            p[f"b{b}k{l}"] = tf_vars[f"ltdvsr/conv{b}_{l}/kernel"]
            p[f"b{b}b{l}"] = tf_vars[f"ltdvsr/conv{b}_{l}/bias"]

    x = np.random.default_rng(3).random((1, t, h, w, 3))
    want = ltdvsr_oracle(x, p, t=t)
    got = _apply(LTDVSR(num_frames=t), params, x)[:, 0]
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_import_drvsr(tmp_path):
    from pfnl_tpu.models.drvsr import DRVSR
    from pfnl_tpu.utils.tf1_imports import import_drvsr_tf1

    rng = np.random.default_rng(14)
    W = _W(rng)
    t, h, w = 3, 8, 8
    tf_vars = _easyflow_tf_vars(W)
    conv_shapes = {
        "enc1": (5, 5, 1, 32), "enc2": (3, 3, 32, 64),
        "enc2_1": (3, 3, 64, 64), "enc3": (3, 3, 64, 128),
        "enc3_1": (3, 3, 128, 128), "dec1_1": (3, 3, 64, 64),
        "dec2_1": (3, 3, 32, 32), "dec3": (5, 5, 32, 1),
        "convLSTM/LSTM_conv": (3, 3, 256, 512),
    }
    for name, sh in conv_shapes.items():
        tf_vars[f"srmodel/{name}/weights"] = W(*sh)
        tf_vars[f"srmodel/{name}/biases"] = W(sh[-1])
    # transpose convs: TF kernel layout [kh, kw, out, in]
    tf_vars["srmodel/dec1/weights"] = W(4, 4, 64, 128)
    tf_vars["srmodel/dec1/biases"] = W(64)
    tf_vars["srmodel/dec2/weights"] = W(4, 4, 32, 64)
    tf_vars["srmodel/dec2/biases"] = W(32)
    prefix = str(tmp_path / "drvsr.ckpt")
    _write_ckpt(prefix, tf_vars)

    params = import_drvsr_tf1(prefix, num_frames=t)

    p = _easyflow_oracle_p(tf_vars)
    for key, name in (("e1", "enc1"), ("e2", "enc2"), ("e21", "enc2_1"),
                      ("e3", "enc3"), ("e31", "enc3_1"), ("d1", "dec1"),
                      ("d11", "dec1_1"), ("d2", "dec2"), ("d21", "dec2_1"),
                      ("d3", "dec3")):
        p[key + "k"] = tf_vars[f"srmodel/{name}/weights"]
        p[key + "b"] = tf_vars[f"srmodel/{name}/biases"]
    p["gk"] = tf_vars["srmodel/convLSTM/LSTM_conv/weights"]
    p["gb"] = tf_vars["srmodel/convLSTM/LSTM_conv/biases"]

    x = np.random.default_rng(4).random((1, t, h, w, 3))
    want = drvsr_oracle(x, p, t=t)
    got = _apply(DRVSR(num_frames=t), params, x)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_import_frvsr(tmp_path):
    from pfnl_tpu.models.frvsr import FRVSR
    from pfnl_tpu.utils.tf1_imports import import_frvsr_tf1

    rng = np.random.default_rng(15)

    # 10 residual blocks @128ch amplify 0.1-std random weights to ~1e8
    # activations (f32 rounding then exceeds tolerance) — keep them small
    def W(*shape, s=0.02):
        return (rng.standard_normal(shape) * s).astype(np.float32)

    nb, mf, h, w = 10, 128, 8, 8
    tf_vars = {}
    cin = 6
    for pp in range(3):
        f = 32 * 2 ** pp
        tf_vars[f"flow/conv0_{pp}_0/kernel"] = W(3, 3, cin, f)
        tf_vars[f"flow/conv0_{pp}_0/bias"] = W(f)
        tf_vars[f"flow/conv0_{pp}_1/kernel"] = W(3, 3, f, f)
        tf_vars[f"flow/conv0_{pp}_1/bias"] = W(f)
        cin = f
    for pp in range(3):
        f = int(256 * 0.5 ** pp)
        tf_vars[f"flow/conv1_{pp}_0/kernel"] = W(3, 3, cin, f)
        tf_vars[f"flow/conv1_{pp}_0/bias"] = W(f)
        tf_vars[f"flow/conv1_{pp}_1/kernel"] = W(3, 3, f, f)
        tf_vars[f"flow/conv1_{pp}_1/bias"] = W(f)
        cin = f
    tf_vars["flow/conv2/kernel"] = W(3, 3, 64, 32)
    tf_vars["flow/conv2/bias"] = W(32)
    tf_vars["flow/conv3/kernel"] = W(3, 3, 32, 2)
    tf_vars["flow/conv3/bias"] = W(2)
    tf_vars["frvsr/conv0_0/kernel"] = W(3, 3, 3, mf)
    tf_vars["frvsr/conv0_0/bias"] = W(mf)
    tf_vars["frvsr/conv0_1/kernel"] = W(3, 3, 51, mf)
    tf_vars["frvsr/conv0_1/bias"] = W(mf)
    for j in range(nb):
        tf_vars[f"frvsr/conv1_{j}/kernel"] = W(3, 3, mf, mf)
        tf_vars[f"frvsr/conv1_{j}/bias"] = W(mf)
        tf_vars[f"frvsr/conv2_{j}/kernel"] = W(3, 3, mf, mf)
        tf_vars[f"frvsr/conv2_{j}/bias"] = W(mf)
    tf_vars["frvsr/large1/kernel"] = W(3, 3, mf, mf)  # [kh,kw,out,in]
    tf_vars["frvsr/large1/bias"] = W(mf)
    tf_vars["frvsr/large2/kernel"] = W(3, 3, mf, mf)
    tf_vars["frvsr/large2/bias"] = W(mf)
    tf_vars["frvsr/out/kernel"] = W(3, 3, mf, 3)
    tf_vars["frvsr/out/bias"] = W(3)
    prefix = str(tmp_path / "frvsr.ckpt")
    _write_ckpt(prefix, tf_vars)

    params = import_frvsr_tf1(prefix, num_blocks=nb)

    p = dict(k00=tf_vars["frvsr/conv0_0/kernel"],
             b00=tf_vars["frvsr/conv0_0/bias"],
             kl1=tf_vars["frvsr/large1/kernel"],
             bl1=tf_vars["frvsr/large1/bias"],
             kl2=tf_vars["frvsr/large2/kernel"],
             bl2=tf_vars["frvsr/large2/bias"],
             ko=tf_vars["frvsr/out/kernel"], bo=tf_vars["frvsr/out/bias"])
    for j in range(nb):
        p[f"k1_{j}"] = tf_vars[f"frvsr/conv1_{j}/kernel"]
        p[f"b1_{j}"] = tf_vars[f"frvsr/conv1_{j}/bias"]
        p[f"k2_{j}"] = tf_vars[f"frvsr/conv2_{j}/kernel"]
        p[f"b2_{j}"] = tf_vars[f"frvsr/conv2_{j}/bias"]

    x = np.random.default_rng(5).random((1, h, w, 3)).astype(np.float32)
    want = frvsr_first_step_oracle(x, p, nb, mf)

    model = FRVSR(num_frames=2, num_blocks=nb, mf=mf)
    full = np.random.default_rng(6).random((1, 2, h, w, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(full))
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, variables["params"])
    new_shapes = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, params)
    assert ref_shapes == new_shapes  # full tree incl. flow + conv0_1 matches
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), params)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                 method=FRVSR.step))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_import_duf(tmp_path):
    from pfnl_tpu.models.duf import DUF
    from pfnl_tpu.utils.tf1_imports import import_duf_tf1

    rng = np.random.default_rng(16)

    # keep activations O(1) through the 15-layer dense stack so the f32
    # oracle comparison stays within tolerance
    def W(*shape, s=0.05):
        return (rng.standard_normal(shape) * s).astype(np.float32)

    t, h, w, growth = 7, 8, 8, 32
    n_thw = n_hw = 3
    tf_vars = {"G/conv1/W": W(1, 3, 3, 3, 64), "G/conv1/b": W(64)}

    def add_bn(name, ch):
        tf_vars[f"G/{name}/beta"] = W(ch)
        tf_vars[f"G/{name}/gamma"] = 1.0 + W(ch)
        tf_vars[f"G/{name}/moving_mean"] = W(ch)
        tf_vars[f"G/{name}/moving_variance"] = np.abs(W(ch)) + 0.5

    feats = 64
    for r in range(1, n_thw + n_hw + 1):
        add_bn(f"Rbn{r}a", feats)
        tf_vars[f"G/Rconv{r}a/W"] = W(1, 1, 1, feats, feats)
        tf_vars[f"G/Rconv{r}a/b"] = W(feats)
        add_bn(f"Rbn{r}b", feats)
        tf_vars[f"G/Rconv{r}b/W"] = W(3, 3, 3, feats, growth)
        tf_vars[f"G/Rconv{r}b/b"] = W(growth)
        feats += growth
    add_bn("fbn1", feats)
    tf_vars.update({
        "G/conv2/W": W(1, 3, 3, feats, 256), "G/conv2/b": W(256),
        "G/rconv1/W": W(1, 1, 1, 256, 256), "G/rconv1/b": W(256),
        "G/rconv2/W": W(1, 1, 1, 256, 48), "G/rconv2/b": W(48),
        "G/fconv1/W": W(1, 1, 1, 256, 512), "G/fconv1/b": W(512),
        "G/fconv2/W": W(1, 1, 1, 512, 400), "G/fconv2/b": W(400),
        # the identity-expansion constant shows up in real checkpoints
        # (utils.py:339-340) and must be skipped
        "G/DynFilter3D/filter_localexpand":
            np.eye(25, dtype=np.float32).reshape(1, 5, 5, 1, 25),
    })
    prefix = str(tmp_path / "duf.ckpt")
    _write_ckpt(prefix, tf_vars)

    params, stats = import_duf_tf1(prefix, layers=16)
    assert "DynFilter3D" not in params["G"]

    p = {"c1k": tf_vars["G/conv1/W"], "c1b": tf_vars["G/conv1/b"]}
    for r in range(n_thw + n_hw):
        for s, key in (("a", "a"), ("b", "b")):
            p[f"bn{r}{s}"] = (tf_vars[f"G/Rbn{r + 1}{s}/beta"],
                              tf_vars[f"G/Rbn{r + 1}{s}/gamma"],
                              tf_vars[f"G/Rbn{r + 1}{s}/moving_mean"],
                              tf_vars[f"G/Rbn{r + 1}{s}/moving_variance"])
        p[f"ak{r}"] = tf_vars[f"G/Rconv{r + 1}a/W"]
        p[f"ab{r}"] = tf_vars[f"G/Rconv{r + 1}a/b"]
        p[f"bk{r}"] = tf_vars[f"G/Rconv{r + 1}b/W"]
        p[f"bb{r}"] = tf_vars[f"G/Rconv{r + 1}b/b"]
    p["fbn1"] = (tf_vars["G/fbn1/beta"], tf_vars["G/fbn1/gamma"],
                 tf_vars["G/fbn1/moving_mean"], tf_vars["G/fbn1/moving_variance"])
    for key, name in (("c2", "conv2"), ("r1", "rconv1"), ("r2", "rconv2"),
                      ("f1", "fconv1"), ("f2", "fconv2")):
        p[key + "k"] = tf_vars[f"G/{name}/W"]
        p[key + "b"] = tf_vars[f"G/{name}/b"]

    x = np.random.default_rng(7).random((1, t, h, w, 3))
    want = duf_oracle(x, p, t=t, n_thw=n_thw, n_hw=n_hw, growth=growth)

    model = DUF(num_frames=t, layers=16)
    tree = {"params": jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), params),
        "batch_stats": jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), stats)}
    got = np.asarray(model.apply(tree, jnp.asarray(x, jnp.float32),
                                 is_train=False)["sr"])[:, 0]
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_import_cli_roundtrip(tmp_path):
    """run.py import-tf1 dispatch: TF ckpt -> orbax -> restore == import."""
    from pfnl_tpu.config import preset
    from pfnl_tpu.train.trainer import Trainer
    from pfnl_tpu.utils.tf1_imports import import_ltdvsr_tf1
    import run

    rng = np.random.default_rng(17)
    W = _W(rng)
    t, r2 = 5, 16
    tf_vars = {
        "flow/conv0/kernel": W(9, 9, 2, 32), "flow/conv0/bias": W(32),
        "flow/conv1/kernel": W(9, 9, 32, 32), "flow/conv1/bias": W(32),
        "flow/conv2/kernel": W(3, 3, 32, 2), "flow/conv2/bias": W(2),
        "ltdvsr/tem0/kernel": W(5, 5, t, 32), "ltdvsr/tem0/bias": W(32),
        "ltdvsr/tem1/kernel": W(5, 5, 32, 16), "ltdvsr/tem1/bias": W(16),
        "ltdvsr/tem2/kernel": W(5, 5, 16, 3), "ltdvsr/tem2/bias": W(3),
    }
    for b in range(3):
        cin = 2 * b + 1
        tf_vars[f"ltdvsr/conv{b}_0/kernel"] = W(5, 5, cin, 64)
        tf_vars[f"ltdvsr/conv{b}_0/bias"] = W(64)
        tf_vars[f"ltdvsr/conv{b}_1/kernel"] = W(3, 3, 64, 64)
        tf_vars[f"ltdvsr/conv{b}_1/bias"] = W(64)
        tf_vars[f"ltdvsr/conv{b}_3/kernel"] = W(3, 3, 64, 64)
        tf_vars[f"ltdvsr/conv{b}_3/bias"] = W(64)
        tf_vars[f"ltdvsr/conv{b}_2/kernel"] = W(3, 3, 64, r2)
        tf_vars[f"ltdvsr/conv{b}_2/bias"] = W(r2)
    prefix = str(tmp_path / "ltdvsr.ckpt")
    _write_ckpt(prefix, tf_vars)

    save_dir = str(tmp_path / "orbax")
    run.main(["import-tf1", "ltdvsr", "--ckpt", prefix,
              "--save-dir", save_dir, "--in-size", "8"])

    cfg = preset("ltdvsr", in_size=8, save_dir=save_dir, reload=True)
    tr = Trainer(cfg)
    state = tr.init_state(jax.random.PRNGKey(1),
                          np.zeros((1, t, 8, 8, 3), np.float32))
    state = tr.restore(state)
    want = import_ltdvsr_tf1(tf_vars, num_frames=t)
    got = jax.device_get(state.params)
    flat_w = jax.tree_util.tree_leaves(want)
    flat_g = jax.tree_util.tree_leaves(got)
    assert len(flat_w) == len(flat_g)
    for a, b in zip(flat_g, flat_w):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
