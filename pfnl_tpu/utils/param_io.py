"""External parameter import (reference utils.py:290-318 `LoadParams`).

The reference loads an hdf5 `params` group into TF variables with a
name-mangling rule ('_' -> '/' between word chars, '__' -> '_') — used to
import the original VSR-DUF weights.  Here the same mangling produces
'/'-separated paths that are matched against a flax param pytree's
flattened paths; matching leaves are replaced (shapes must agree).
"""

from typing import Dict

import numpy as np
import jax


def _parse_name(name: str) -> str:
    """Reference name mangling (utils.py:300-306)."""
    chars = list(name)
    for i in range(1, len(chars) - 1):
        if chars[i] == "_" and chars[i - 1] != "_" and chars[i + 1] != "_":
            chars[i] = "/"
    return "".join(chars).replace("__", "_")


def load_hdf5_params(params, h5_path: str, group: str = "params",
                     verbose: bool = True):
    """Returns a copy of `params` with leaves replaced by matching hdf5
    datasets.  Matching: the mangled dataset name must equal the
    '/'-joined flax path (case-insensitive), or be a suffix of it."""
    import h5py

    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves, treedef = flat
    paths = ["/".join(str(getattr(k, "key", k)) for k in path) for path, _ in leaves]
    values = [v for _, v in leaves]

    with h5py.File(h5_path, "r") as f:
        g = f[group]
        loaded: Dict[int, np.ndarray] = {}
        misses = []
        for name in g:
            parsed = _parse_name(name).lower()
            hit = None
            for idx, p in enumerate(paths):
                pl_ = p.lower()
                if pl_ == parsed or pl_.endswith("/" + parsed) or parsed.endswith("/" + pl_):
                    hit = idx
                    break
            if hit is None:
                misses.append(name)
                continue
            arr = np.asarray(g[name])
            if arr.shape != values[hit].shape:
                misses.append(f"{name} (shape {arr.shape} != {values[hit].shape})")
                continue
            loaded[hit] = arr
        if verbose:
            for m in misses:
                print(f"Warning::Cant find param: {m}, ignore if intended.")
            print(f"Parameters are loaded ({len(loaded)}/{len(paths)} leaves)")

    new_leaves = [
        jax.numpy.asarray(loaded[i]) if i in loaded else v
        for i, v in enumerate(values)
    ]
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params), new_leaves
    )


def get_num_params(params) -> int:
    """Total parameter count (reference utils.py:87-92)."""
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


# Caffe FlowNet layer names -> pfnl_tpu.models.flownet decoder names.
# The reference's TF variable scopes mirror the caffemodel layer names
# (weight_from_caffe, modules/utils.py:4-10, looks blobs up by the last
# scope segment), so these ARE the caffemodel names.
_FLOWNET_DECODER_MAP = {
    "Convolution1": "predict_flow6",
    "Convolution2": "predict_flow5",
    "Convolution3": "predict_flow4",
    "Convolution4": "predict_flow3",
    "Convolution5": "predict_flow2",
    "upsample_flow6to5": "upsample_flow6",
    "upsample_flow5to4": "upsample_flow5",
    "upsample_flow4to3": "upsample_flow4",
    "upsample_flow3to2": "upsample_flow3",
    "deconv5": "deconv5",
    "deconv4": "deconv4",
    "deconv3": "deconv3",
    "deconv2": "deconv2",
}


def _caffe_conv_kernel(w: np.ndarray) -> np.ndarray:
    """Caffe conv blob [out, in, kh, kw] -> flax HWIO — the perm the
    reference applies at modules/utils.py:9 ([2,3,1,0]), which is already
    TF/flax conv layout."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _caffe_deconv_kernel(w: np.ndarray) -> np.ndarray:
    """Caffe DECONV blob [in, out, kh, kw] -> flax ConvTranspose
    [kh, kw, in, out]: the reference's perm [2,3,1,0] yields the TF
    conv2d_transpose layout [kh, kw, out, in]; the flax conversion then
    mirrors spatially and swaps the channel axes (lax.conv_transpose
    does not flip the kernel) — same rule as tf1_imports._deconv."""
    k_tf = np.transpose(w, (2, 3, 1, 0))
    return np.ascontiguousarray(k_tf[::-1, ::-1].transpose(0, 1, 3, 2))


def load_caffe_flownet(params, caffe_params, verbose: bool = True):
    """Import Caffe-layout FlowNet-S/C weights into a flax param tree
    (replaces the pycaffe loaders at modules/utils.py:4-17 and the
    weights_initializer plumbing at modules/model_flownet.py:14-19).

    `caffe_params`: dict mapping caffemodel layer name -> (weight, bias)
    numpy arrays in Caffe blob layout (conv [out,in,kh,kw], deconv
    [in,out,kh,kw]).  Returns a copy of `params` with matching leaves
    replaced; unmatched caffe layers are warned about like the
    reference's LoadParams (utils.py:314-316)."""
    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    paths = ["/".join(str(getattr(k, "key", k)) for k in path)
             for path, _ in leaves]
    values = [v for _, v in leaves]

    loaded: Dict[int, np.ndarray] = {}
    misses = []
    for name, (w, b) in caffe_params.items():
        is_deconv = name.startswith(("deconv", "upsample_flow"))
        target = _FLOWNET_DECODER_MAP.get(name, name)
        kernel = (_caffe_deconv_kernel if is_deconv
                  else _caffe_conv_kernel)(np.asarray(w))
        for leaf_name, arr in (("kernel", kernel),
                               ("bias", np.asarray(b))):
            want = f"{target}/{leaf_name}"
            hit = next((i for i, p in enumerate(paths)
                        if p == want or p.endswith("/" + want)), None)
            if hit is None:
                misses.append(f"{name} ({leaf_name})")
            elif arr.shape != values[hit].shape:
                misses.append(
                    f"{name} ({leaf_name} shape {arr.shape} != "
                    f"{values[hit].shape})")
            else:
                loaded[hit] = arr
    if verbose:
        for m in misses:
            print(f"Warning::Cant find param: {m}, ignore if intended.")
        print(f"Caffe params loaded ({len(loaded)}/{len(paths)} leaves)")

    new_leaves = [
        jax.numpy.asarray(loaded[i]) if i in loaded else v
        for i, v in enumerate(values)
    ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
