"""AOT model export for serving (no reference counterpart — the TF1
reference rebuilds its graph per process per shape, model/pfnl.py:220).

`export_model` traces a model's COMPLETE per-chip serving program at a
fixed geometry (for Y-channel families this includes the RGB
reconstruction — SR Y + bicubic CbCr -> ycbcr2rgb — so the artifact
emits final RGB frames), lowers it through XLA to serialized StableHLO
(`jax.export`), and writes a self-contained artifact: the weights are
baked in as constants, so a serving process needs only jax + the
artifact — no model code, no checkpoint directory, no re-trace.  Pallas
TPU kernels survive the round trip as `tpu_custom_call`s when exported
for the tpu platform.  (FRVSR exports its windowed forward; the
streaming path's state feedback is a Python-level loop and stays with
the Predictor.)

`load_exported` restores a callable from the artifact.  Exported
artifacts are platform-checked by jax at call time (an artifact exported
for tpu refuses to run on cpu rather than silently recompiling).

Typical flow:
    run.py export pfnl --save-dir ckpt/pfnl --hw 180x320 --batch 8 \
                       --out pfnl_720p.shlo
    fn = load_exported("pfnl_720p.shlo"); sr = fn(lr_batch)
"""

import json
import struct

import numpy as np

_MAGIC = b"PFNLXP01"


def export_model(model, variables, batch: int, frames: int, hw, *,
                 dtype=None, platforms=None, extra_kwargs=None,
                 model_name=None) -> bytes:
    """Serialize the serving program for `model` at the given geometry.

    model_name: the framework family name ("pfnl", "vespcn", ...); when
    given, the exported function is the full serving program from
    `infer.predictor.make_serving_fn` (RGB out for Y families).  When
    None, exports `model.apply(variables, x)["sr"]` raw.
    variables: full variable dict (params [+ batch_stats]).
    hw: (h, w) LR input size.  dtype: input dtype (default f32).
    platforms: lowering platforms (default: the current backend).
    extra_kwargs: static apply kwargs for the raw path."""
    import jax
    import jax.numpy as jnp

    h, w = hw
    if model_name is not None:
        from pfnl_tpu.infer.predictor import make_serving_fn

        per_chip, _ = make_serving_fn(model_name, model, frames)

        def fn(x):
            return per_chip(variables, x)
    else:
        kw = dict(extra_kwargs or {})

        def fn(x):
            return model.apply(variables, x, **kw)["sr"]

    x_spec = jax.ShapeDtypeStruct((batch, frames, h, w, 3),
                                  dtype or jnp.float32)
    exp = jax.export.export(jax.jit(fn), platforms=platforms)(x_spec)
    payload = exp.serialize()
    meta = {
        "in_shape": [batch, frames, h, w, 3],
        "in_dtype": str(np.dtype(x_spec.dtype)),
        "platforms": list(exp.platforms),
        "model": model_name or type(model).__name__,
    }
    head = json.dumps(meta).encode()
    return _MAGIC + struct.pack("<I", len(head)) + head + bytes(payload)


def _split(blob: bytes):
    """(meta dict, serialized payload) from an artifact."""
    if blob[:8] != _MAGIC:
        raise ValueError("not a pfnl_tpu export artifact")
    (n,) = struct.unpack("<I", blob[8:12])
    return json.loads(blob[12:12 + n].decode()), blob[12 + n:]


def read_meta(blob: bytes) -> dict:
    return _split(blob)[0]


def load_exported(path_or_bytes):
    """Restore a callable fn(x) -> output from an export artifact.  The
    returned fn carries `.meta` (geometry/platform info)."""
    import jax

    if isinstance(path_or_bytes, (bytes, bytearray)):
        blob = path_or_bytes
    else:
        with open(path_or_bytes, "rb") as f:
            blob = f.read()
    meta, payload = _split(blob)
    exp = jax.export.deserialize(bytearray(payload))
    fn = jax.jit(exp.call)
    fn.meta = meta
    return fn
