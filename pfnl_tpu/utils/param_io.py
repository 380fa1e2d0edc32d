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
