"""TF-free TF1 checkpoint reader + PFNL importer, validated against a real
TF-written TensorBundle and the numpy model oracle."""

import os
import subprocess
import sys

import numpy as np
import pytest

from test_golden_models import pfnl_oracle

pytestmark = pytest.mark.tf

_HELPER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "tf_write_ckpt.py")


def _write_ckpt(prefix, arrays):
    """Write a TF1 TensorBundle via a SUBPROCESS (tf_write_ckpt.py):
    TF+JAX+torch in one process segfault on long runs, so TF never
    loads into the pytest process."""
    npz = prefix + ".vars.npz"
    np.savez(npz, **arrays)
    proc = subprocess.run(
        [sys.executable, _HELPER, npz, prefix],
        capture_output=True, text=True, timeout=600)
    if proc.returncode != 0:
        if "No module named" in proc.stderr:
            pytest.skip("tensorflow unavailable")
        raise RuntimeError(f"tf_write_ckpt failed:\n{proc.stderr[-3000:]}")


def test_reader_roundtrip(tmp_path):
    from pfnl_tpu.utils.tf1_ckpt import list_tf1_variables, load_tf1_checkpoint

    rng = np.random.default_rng(0)
    arrays = {
        "scope/a/kernel": rng.standard_normal((3, 3, 8, 16)).astype(np.float32),
        "scope/a/bias": rng.standard_normal((16,)).astype(np.float32),
        "deep/nested/name/v": rng.standard_normal((5, 7)).astype(np.float32),
        "global_step": np.asarray(1234, np.int64),
        # enough variables to force multiple index blocks
        **{f"many/v{i:03d}": rng.standard_normal((17,)).astype(np.float32)
           for i in range(80)},
    }
    prefix = str(tmp_path / "model.ckpt")
    _write_ckpt(prefix, arrays)

    names = list_tf1_variables(prefix)
    assert set(names) == set(arrays)
    assert names["scope/a/kernel"][0] == [3, 3, 8, 16]

    loaded = load_tf1_checkpoint(prefix)
    for name, want in arrays.items():
        np.testing.assert_array_equal(loaded[name], want)


def test_import_pfnl_forward_matches_oracle(tmp_path):
    """Authors'-style checkpoint -> importer -> flax forward == oracle."""
    import jax
    import jax.numpy as jnp

    from pfnl_tpu.models.pfnl import PFNL
    from pfnl_tpu.utils.tf1_ckpt import import_pfnl_tf1

    rng = np.random.default_rng(3)
    t, mf, h, w = 3, 64, 8, 8
    cnl = 3 * t * 4

    def W(*shape, s=0.1):
        return (rng.standard_normal(shape) * s).astype(np.float32)

    tf_vars = {
        "nlvsr/nlblock_0/g/g/kernel": W(1, 1, cnl, cnl),
        "nlvsr/nlblock_0/g/g/bias": W(cnl),
        "nlvsr/nlblock_0/w/w/kernel": W(1, 1, cnl, cnl),
        "nlvsr/nlblock_0/w/w/bias": W(cnl),
        "nlvsr/conv0/kernel": W(5, 5, 3, mf),
        "nlvsr/conv0/bias": W(mf),
        "nlvsr/conv1_0/kernel": W(3, 3, mf, mf),
        "nlvsr/conv1_0/bias": W(mf),
        "nlvsr/conv10_0/kernel": W(1, 1, t * mf, mf),
        "nlvsr/conv10_0/bias": W(mf),
        "nlvsr/conv2_0/kernel": W(3, 3, 2 * mf, mf),
        "nlvsr/conv2_0/bias": W(mf),
        "nlvsr/convmerge1/kernel": W(3, 3, t * mf, 48),
        "nlvsr/convmerge1/bias": W(48),
        "nlvsr/convmerge2/kernel": W(3, 3, 12, 12),
        "nlvsr/convmerge2/bias": W(12),
        # importer must skip optimizer slots
        "nlvsr/conv0/kernel/Adam": W(5, 5, 3, mf),
        "global_step": np.asarray(150000, np.int64),
    }
    prefix = str(tmp_path / "pfnl.ckpt")
    _write_ckpt(prefix, tf_vars)

    params = import_pfnl_tf1(prefix, num_blocks=1, num_frames=t, mf=mf)

    x = rng.random((1, t, h, w, 3))
    p = dict(
        g_k=tf_vars["nlvsr/nlblock_0/g/g/kernel"],
        g_b=tf_vars["nlvsr/nlblock_0/g/g/bias"],
        w_k=tf_vars["nlvsr/nlblock_0/w/w/kernel"],
        w_b=tf_vars["nlvsr/nlblock_0/w/w/bias"],
        k0=tf_vars["nlvsr/conv0/kernel"], b0=tf_vars["nlvsr/conv0/bias"],
        w1=tf_vars["nlvsr/conv1_0/kernel"], b1=tf_vars["nlvsr/conv1_0/bias"],
        wfuse_cat=tf_vars["nlvsr/conv10_0/kernel"],
        bfuse=tf_vars["nlvsr/conv10_0/bias"],
        w2_cat=tf_vars["nlvsr/conv2_0/kernel"], b2=tf_vars["nlvsr/conv2_0/bias"],
        km1=tf_vars["nlvsr/convmerge1/kernel"],
        bm1=tf_vars["nlvsr/convmerge1/bias"],
        km2=tf_vars["nlvsr/convmerge2/kernel"],
        bm2=tf_vars["nlvsr/convmerge2/bias"],
    )
    want = pfnl_oracle(x, p, t)

    model = PFNL(num_frames=t, num_blocks=1)
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), params)
    got = np.asarray(model.apply({"params": params},
                                 jnp.asarray(x, jnp.float32))["sr"])[:, 0]
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)
