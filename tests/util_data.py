"""Synthetic tiny datasets for end-to-end tests."""

import os

import numpy as np

from pfnl_tpu.ops.degrade import downsample_4d
from pfnl_tpu.utils.image_io import imsave


def make_dataset(root, num_seqs=2, num_frames=10, hw=(48, 48), scale=4, seed=0):
    """Create sequences with truth/ + blur{scale}/ PNGs and a filelist.
    Frames are smooth translating gradients so flow/SR have signal."""
    rng = np.random.default_rng(seed)
    h, w = hw
    seq_dirs = []
    for s in range(num_seqs):
        d = os.path.join(root, f"seq_{s:03d}")
        os.makedirs(os.path.join(d, "truth"), exist_ok=True)
        os.makedirs(os.path.join(d, f"blur{scale}"), exist_ok=True)
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        phase = rng.random(3) * 6.28
        frames = []
        for t in range(num_frames):
            img = np.stack(
                [
                    0.5 + 0.4 * np.sin(2 * np.pi * (xx + 2 * t) / 24 + phase[c])
                    * np.cos(2 * np.pi * (yy + t) / 20 + phase[c])
                    for c in range(3)
                ],
                axis=-1,
            )
            img = np.clip(img + 0.05 * rng.random((h, w, 3)), 0, 1).astype(np.float32)
            frames.append(img)
            imsave(os.path.join(d, "truth", f"{t:04d}.png"), np.round(img * 255).astype(np.uint8))
        lr = np.asarray(downsample_4d(np.stack(frames), scale=scale))
        for t in range(num_frames):
            imsave(
                os.path.join(d, f"blur{scale}", f"{t:04d}.png"),
                np.round(np.clip(lr[t], 0, 1) * 255).astype(np.uint8),
            )
        seq_dirs.append(d)
    filelist = os.path.join(root, "filelist.txt")
    with open(filelist, "wt") as f:
        f.write("\n".join(seq_dirs) + "\n")
    return filelist, seq_dirs
