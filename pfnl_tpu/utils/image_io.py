"""Host-side image IO.

RGB channel order everywhere (the reference wraps cv2 with BGR<->RGB swaps,
utils.py:362-372; we do the same so saved PNGs are byte-identical).
PNG round-trips are uint8 with round-then-clip like the reference test
paths (model/pfnl.py:255-257).
"""

import os

import numpy as np

try:
    import cv2

    _HAVE_CV2 = True
except ImportError:  # pragma: no cover - cv2 is present in this image
    from PIL import Image

    _HAVE_CV2 = False


def automkdir(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def imread(path: str) -> np.ndarray:
    """uint8 RGB [H,W,3] (grayscale files come back [H,W])."""
    if _HAVE_CV2:
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if img is None:
            raise FileNotFoundError(path)
        if img.ndim == 3:
            img = img[:, :, [2, 1, 0]]
        return img
    return np.asarray(Image.open(path).convert("RGB"))


def imsave(path: str, img: np.ndarray) -> None:
    img = np.squeeze(img)
    if _HAVE_CV2:
        if img.ndim == 3:
            img = img[:, :, [2, 1, 0]]
        if not cv2.imwrite(path, img):  # cv2 fails SILENTLY (e.g. no dir)
            raise IOError(f"imsave failed: {path}")
    else:
        Image.fromarray(img).save(path)


def to_uint8_img(x: np.ndarray) -> np.ndarray:
    """float [0,1] -> uint8 with round-then-clip (model/pfnl.py:255-257)."""
    return np.round(np.clip(x * 255.0, 0, 255)).astype(np.uint8)


def im2uint8(x: np.ndarray) -> np.ndarray:
    """clip to [0,1] then scale (reference modules/videosr_ops.py:8-13 —
    note: truncates like the reference, no rounding)."""
    return (np.clip(x, 0.0, 1.0) * 255.0).astype(np.uint8)


def augmentation_np(lr: np.ndarray, hr: np.ndarray, rng=None):
    """Random flip/transpose on [N,T,H,W,C] numpy batches
    (reference utils.py:374-386; unused by the main paths but part of the
    API surface)."""
    rng = rng or np.random.default_rng()
    a = int(rng.integers(0, 2))
    b = int(rng.integers(0, 2))
    rot = int(rng.integers(0, 2))
    if a + b > 0:
        sa = -2 * a + 1
        sb = -2 * b + 1
        lr = lr[:, :, ::sa, ::sb, :]
        hr = hr[:, :, ::sa, ::sb, :]
    if rot == 1:
        lr = lr.transpose((0, 1, 3, 2, 4))
        hr = hr.transpose((0, 1, 3, 2, 4))
    return lr, hr
