"""Training input pipeline.

Host side: a small thread pool samples (sequence, window, crop) uniformly,
decodes PNGs and crops — producing uint8 batches (the reference used TF1
queue runners with 3 threads, model/base_model.py:196-198).

Device side: `device_augment_and_degrade` runs INSIDE the jitted train step:
uint8 -> float, per-sample flip/transpose augmentation, and (for the
"single" producer) the Gaussian blur + decimation.  This removes the
reference's per-step device->host->device round trip of the batch
(model/pfnl.py:194-195, SURVEY.md §3.1) and keeps the depthwise conv on
the MXU.

Producer modes mirror the reference's three input producers:
  single  GT-only, on-the-fly degradation   (base_model.py:150-199, PFNL)
  double  pre-rendered LR + center GT frame (base_model.py:89-148,
          VESPCN/LTDVSR/MCResNet/DRVSR/DUF)
  frvsr   LR + all GT frames, no flip aug   (base_model.py:36-87, FRVSR)
"""

import queue
import threading
from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp

from pfnl_tpu.data.manifest import Sequence
from pfnl_tpu.ops.degrade import downsample
from pfnl_tpu.utils.image_io import imread

try:  # native C++ decode+crop (pfnl_tpu/native/loader.cc)
    from pfnl_tpu import native as _native

    _HAVE_NATIVE = _native.available()
except Exception:  # pragma: no cover
    _native = None
    _HAVE_NATIVE = False


def _random_crop_coords(rng, h, w, size):
    return rng.integers(0, h - size + 1), rng.integers(0, w - size + 1)


def sample_flip_crop(rng, h, w, in_size, scale):
    """Crop offsets + flips for a pre-rendered LR/GT pair such that the
    flipped pair stays aligned.

    The degradation (ops/degrade.py, reference utils.py:160-163: REFLECT
    pad scale+2 then stride-`scale` depthwise conv) centers LR pixel i at
    GT pixel scale*i.  Flipping an LR crop and the correspondingly-cropped
    GT patch therefore misaligns the pair by scale-1 GT pixels — the
    reference's double_input_producer has this bug (base_model.py:97-103;
    its own comment reads "if training gets worse, comment the data flip
    part out", and on aliasing-critical content it trains the model to
    blur).  Fix: when flipping along an axis, crop GT at
    scale*y0 - (scale-1) instead of scale*y0 (measured exact:
    flip(LR) == downsample(roll(flip(GT), -(scale-1)))).

    Returns (y0, x0, gy, gx, flip_y, flip_x, transpose): LR crop offsets,
    GT crop offsets, and the flips to apply to both decoded patches.
    """
    flip_y, flip_x, transpose = rng.random(3) < 0.5
    flip_y &= h - in_size >= 1  # need 1 LR px of margin for the GT shift
    flip_x &= w - in_size >= 1
    y0 = rng.integers(1 if flip_y else 0, h - in_size + 1)
    x0 = rng.integers(1 if flip_x else 0, w - in_size + 1)
    gy = y0 * scale - ((scale - 1) if flip_y else 0)
    gx = x0 * scale - ((scale - 1) if flip_x else 0)
    return y0, x0, gy, gx, flip_y, flip_x, transpose


class TrainPipeline:
    """Background-threaded sampler producing uint8 numpy batches."""

    def __init__(
        self,
        sequences: List[Sequence],
        mode: str,
        num_frames: int,
        in_size: int,
        scale: int,
        batch_size: int,
        seed: int = 0,
        num_threads: int = 2,
        prefetch: int = 4,
        augment: bool = True,
    ):
        """augment: for "double", alignment-preserving host-side flips
        (sample_flip_crop); "single" augments on device (flip before
        degrade is exact); "frvsr" never augments (reference parity)."""
        assert mode in ("single", "double", "frvsr")
        self.augment = augment
        self.sequences = [s for s in sequences if len(s.truth) >= num_frames]
        if not self.sequences:
            raise ValueError("no usable sequences (need >= num_frames truth frames)")
        if mode in ("double", "frvsr"):
            for s in self.sequences:
                if len(s.blur) != len(s.truth):
                    raise ValueError(f"{s.path}: blur/truth frame count mismatch")
        self.mode = mode
        self.num_frames = num_frames
        self.in_size = in_size
        self.scale = scale
        self.gt_size = in_size * scale
        self.batch_size = batch_size
        self._size_cache: Dict[str, tuple] = {}
        self._q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._threads = [
            threading.Thread(target=self._worker, args=(seed + i,), daemon=True)
            for i in range(num_threads)
        ]
        for t in self._threads:
            t.start()

    # --- host sampling -------------------------------------------------
    def _frame_size(self, path: str):
        size = self._size_cache.get(path)
        if size is None:
            if _HAVE_NATIVE:
                size = _native.png_size(path)
            else:
                size = imread(path).shape[:2]
            self._size_cache[path] = size
        return size

    def _decode_window(self, paths, y0: int, x0: int, size: int) -> np.ndarray:
        """Decode + crop a window of frames; native C++ path when built."""
        if _HAVE_NATIVE:
            n = len(paths)
            return _native.decode_crop_batch(
                list(paths), [y0] * n, [x0] * n, (size, size),
                threads=min(4, n),
            )
        return np.stack([imread(p)[y0 : y0 + size, x0 : x0 + size] for p in paths])

    def _sample_one(self, rng) -> Dict[str, np.ndarray]:
        seq = self.sequences[rng.integers(len(self.sequences))]
        t0 = rng.integers(0, len(seq.truth) - self.num_frames + 1)
        idx = list(range(t0, t0 + self.num_frames))
        if self.mode == "single":
            h, w = self._frame_size(seq.truth[idx[0]])
            y0, x0 = _random_crop_coords(rng, h, w, self.gt_size)
            gt = self._decode_window([seq.truth[i] for i in idx], y0, x0, self.gt_size)
            return {"gt": gt}
        # double / frvsr: aligned LR + GT crops
        h, w = self._frame_size(seq.blur[idx[0]])
        if self.mode == "double" and self.augment:
            # alignment-preserving host-side flips (see sample_flip_crop)
            y0, x0, gy, gx, fy, fx, ftr = sample_flip_crop(
                rng, h, w, self.in_size, self.scale)
        else:
            y0, x0 = _random_crop_coords(rng, h, w, self.in_size)
            gy, gx = y0 * self.scale, x0 * self.scale
            fy = fx = ftr = False
        lr = self._decode_window([seq.blur[i] for i in idx], y0, x0, self.in_size)
        if self.mode == "double":
            gt = self._decode_window(
                [seq.truth[t0 + self.num_frames // 2]], gy, gx, self.gt_size
            )
        else:
            gt = self._decode_window([seq.truth[i] for i in idx], gy, gx, self.gt_size)
        if fy:
            lr, gt = lr[:, ::-1], gt[:, ::-1]
        if fx:
            lr, gt = lr[:, :, ::-1], gt[:, :, ::-1]
        if ftr:
            lr = lr.transpose(0, 2, 1, 3)
            gt = gt.transpose(0, 2, 1, 3)
        if fy or fx or ftr:
            lr, gt = np.ascontiguousarray(lr), np.ascontiguousarray(gt)
        return {"lr": lr, "gt": gt}

    def _worker(self, seed: int):
        rng = np.random.default_rng(seed)
        while not self._stop.is_set():
            samples = [self._sample_one(rng) for _ in range(self.batch_size)]
            batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def get_batch(self) -> Dict[str, np.ndarray]:
        return self._q.get()

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass


# --- device-side augmentation + degradation (jit-fused) ----------------


def _flip_clip(clip, do_h, do_w, do_t):
    """clip: [T,H,W,C]; flips follow base_model.py:97-103/174-177."""
    clip = jnp.where(do_h, clip[:, ::-1], clip)
    clip = jnp.where(do_w, clip[:, :, ::-1], clip)
    clip = jnp.where(do_t, jnp.transpose(clip, (0, 2, 1, 3)), clip)
    return clip


def device_augment_and_degrade(
    batch: Dict[str, jax.Array],
    key: jax.Array,
    mode: str,
    scale: int,
    augment: bool = True,
    legacy_double_flip: bool = False,
):
    """uint8 host batch -> float LR/GT training tensors, on device.

    single: {"gt" [B,T,S,S,3]} -> lr [B,T,s,s,3], gt center [B,1,S,S,3]
            (flip THEN degrade, so augmented pairs stay exactly aligned)
    double: {"lr","gt"} -> pass-through; flips happen on the host with
            alignment-corrected GT crops (sample_flip_crop).  Flipping a
            pre-rendered LR/GT pair "consistently" here misaligns it by
            scale-1 GT px — the reference bug (base_model.py:97-103) is
            available behind legacy_double_flip=True for parity studies.
    frvsr:  {"lr","gt"} -> no augmentation (reference parity)
    """
    if mode == "single":
        gt = batch["gt"].astype(jnp.float32) / 255.0
        b, t = gt.shape[:2]
        if augment:
            flips = jax.random.uniform(key, (b, 3)) < 0.5
            gt = jax.vmap(_flip_clip)(gt, flips[:, 0], flips[:, 1], flips[:, 2])
        lr = downsample(gt, scale=scale)
        return lr, gt[:, t // 2 : t // 2 + 1]
    lr = batch["lr"].astype(jnp.float32) / 255.0
    gt = batch["gt"].astype(jnp.float32) / 255.0
    if mode == "double" and augment and legacy_double_flip:
        b = lr.shape[0]
        flips = jax.random.uniform(key, (b, 3)) < 0.5
        lr = jax.vmap(_flip_clip)(lr, flips[:, 0], flips[:, 1], flips[:, 2])
        gt = jax.vmap(_flip_clip)(gt, flips[:, 0], flips[:, 1], flips[:, 2])
    return lr, gt
