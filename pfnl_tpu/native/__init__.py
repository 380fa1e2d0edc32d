"""ctypes bindings for the native C++ loader (loader.cc).

Compiled on first import with g++ (cached in native/build/); falls back
gracefully (`AVAILABLE = False`) when no toolchain/libpng is present, in
which case the pipeline uses its pure-Python path.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "loader.cc")
_BUILD = os.path.join(_DIR, "build")
_SO = os.path.join(_BUILD, "libpfnl_loader.so")

_lib = None
_lock = threading.Lock()
AVAILABLE = False


def _compile() -> bool:
    os.makedirs(_BUILD, exist_ok=True)
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return True
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
        "-o", _SO, "-lpng", "-lz", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, AVAILABLE
    with _lock:
        if _lib is not None:
            return _lib
        if not _compile():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.pfnl_png_size.restype = ctypes.c_int
        lib.pfnl_png_size.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.pfnl_decode_crop_batch.restype = ctypes.c_int
        lib.pfnl_decode_crop_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int,
        ]
        lib.pfnl_encode_png.restype = ctypes.c_int
        lib.pfnl_encode_png.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int,
            ctypes.c_int,
        ]
        _lib = lib
        AVAILABLE = True
        return lib


def png_size(path: str):
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.pfnl_png_size(path.encode(), ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise IOError(f"pfnl_png_size({path}) -> {rc}")
    return h.value, w.value


def decode_crop_batch(paths, y0=None, x0=None, crop_hw=None, threads: int = 4):
    """Decode `paths` (optionally cropping) into one uint8 array.

    crop_hw=None decodes full frames (all must share a size).
    Returns [N, H, W, 3] uint8."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    if crop_hw is None:
        h, w = png_size(paths[0])
        ch, cw = -1, -1
        out = np.empty((n, h, w, 3), np.uint8)
        y = np.zeros(n, np.int32)
        x = np.zeros(n, np.int32)
    else:
        ch, cw = crop_hw
        out = np.empty((n, ch, cw, 3), np.uint8)
        y = np.asarray(y0, np.int32)
        x = np.asarray(x0, np.int32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.pfnl_decode_crop_batch(
        c_paths,
        n,
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ch,
        cw,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        threads,
    )
    if failures:
        raise IOError(f"native decode failed for {failures}/{n} images")
    return out


def encode_png(path: str, img: np.ndarray):
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    img = np.ascontiguousarray(img, np.uint8)
    assert img.ndim == 3 and img.shape[2] == 3, img.shape
    rc = lib.pfnl_encode_png(
        path.encode(),
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        img.shape[0],
        img.shape[1],
    )
    if rc != 0:
        raise IOError(f"pfnl_encode_png({path}) -> {rc}")


def available() -> bool:
    return _load() is not None
