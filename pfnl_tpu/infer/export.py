"""AOT model export for serving (no reference counterpart — the TF1
reference rebuilds its graph per process per shape, model/pfnl.py:220).

`export_model` traces a model's inference forward at a fixed geometry,
lowers it through XLA to serialized StableHLO (`jax.export`), and writes
a self-contained artifact: the weights are baked in as constants, so a
serving process needs only jax + the artifact — no model code, no
checkpoint directory, no re-trace.  Pallas TPU kernels survive the round
trip as `tpu_custom_call`s when exported for the tpu platform.

`load_exported` restores a callable from the artifact.  Exported
artifacts are platform-checked by jax at call time (an artifact exported
for tpu refuses to run on cpu rather than silently recompiling).

Typical flow:
    run.py export pfnl --save-dir ckpt/pfnl --hw 180x320 --batch 8 \
                       --out pfnl_720p.shlo
    fn = load_exported("pfnl_720p.shlo"); sr = fn(lr_batch)
"""

import io
import json
import struct

import numpy as np

_MAGIC = b"PFNLXP01"


def export_model(model, variables, batch: int, frames: int, hw, *,
                 dtype=None, platforms=None, extra_kwargs=None) -> bytes:
    """Serialize `model.apply(variables, x)["sr"]` at the given geometry.

    model: a flax module with the framework's `{"sr": ...}` output
    convention.  variables: full variable dict (params [+ batch_stats]).
    hw: (h, w) LR input size.  dtype: input dtype (default f32).
    platforms: lowering platforms (default: the current backend).
    extra_kwargs: static apply kwargs (e.g. {"is_train": False} for DUF).
    """
    import jax
    import jax.numpy as jnp

    h, w = hw
    kw = dict(extra_kwargs or {})

    def fn(x):
        return model.apply(variables, x, **kw)["sr"]

    x_spec = jax.ShapeDtypeStruct((batch, frames, h, w, 3),
                                  dtype or jnp.float32)
    exp = jax.export.export(
        jax.jit(fn), platforms=platforms)(x_spec)
    payload = exp.serialize()
    meta = {
        "in_shape": [batch, frames, h, w, 3],
        "in_dtype": str(np.dtype(x_spec.dtype)),
        "platforms": list(exp.platforms),
        "model": type(model).__name__,
    }
    head = json.dumps(meta).encode()
    return _MAGIC + struct.pack("<I", len(head)) + head + bytes(payload)


def read_meta(blob: bytes) -> dict:
    assert blob[:8] == _MAGIC, "not a pfnl_tpu export artifact"
    (n,) = struct.unpack("<I", blob[8:12])
    return json.loads(blob[12:12 + n].decode())


def load_exported(path_or_bytes):
    """Restore a callable fn(x) -> sr from an export artifact.  The
    returned fn carries `.meta` (geometry/platform info)."""
    import jax

    blob = (path_or_bytes if isinstance(path_or_bytes, (bytes, bytearray))
            else open(path_or_bytes, "rb").read())
    meta = read_meta(blob)
    (n,) = struct.unpack("<I", blob[8:12])
    exp = jax.export.deserialize(bytearray(blob[12 + n:]))
    fn = jax.jit(exp.call)
    fn.meta = meta
    return fn
