"""Periodic validation, replicating each reference family's eval() exactly
(SURVEY.md §3.3):

  * window centers at frame 15, 47, 79, ... (stride 32);
  * 7-frame windows edge-clamped at sequence boundaries;
  * GT cropped [border : out_h+border] with border=8, LR by border/scale;
  * batches of eval_batch_size=4; LEFTOVER windows that don't fill a batch
    are dropped (reference quirk, model/pfnl.py:127);
  * PSNR = 10*log10(1/mse) on the family's mse definition;
  * appends the reference's JSON-ish log line, with its 1e-6 (PFNL-family)
    or 1e-8 (VESPCN-family) truncation.

Families:
  pfnl    GT-only: degrade on device, RGB mse vs center GT (pfnl.py:94-149)
  vespcn  LR files + center GT: Y mse + SSIM  (vespcn.py:132-210)
          [deviation: reference SSIMs the Y prediction against the R
           channel of the RGB GT (vespcn.py:184); we use the Y channel]
  frvsr   10-frame windows idx0-5..idx0+4 (frvsr.py:179), RGB mse per frame
  duf     LR windows + center GT, RGB mse, is_train=False (dufvsr.py:70-131)
"""

from typing import Callable, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from pfnl_tpu.config import Config
from pfnl_tpu.data.manifest import load_manifest
from pfnl_tpu.eval.metrics import compute_ssim, compute_ssim_batch
from pfnl_tpu.ops.color import rgb2y
from pfnl_tpu.ops.degrade import downsample
from pfnl_tpu.utils.image_io import imread

_FAMILY = {
    "pfnl": "pfnl",
    "vespcn": "vespcn",
    "mcresnet": "vespcn",
    "ltdvsr": "vespcn",
    "drvsr": "vespcn",
    "frvsr": "frvsr",
    "duf": "duf",
}


def _clipped_window(idx0: int, radius: int, max_frame: int, length: int) -> List[int]:
    idx = np.arange(idx0 - radius, idx0 - radius + length)
    return np.clip(idx, 0, max_frame - 1).tolist()


class Evaluator:
    def __init__(self, cfg: Config, model, center: int = 15, stride: int = 32,
                 border: int = 8):
        self.cfg = cfg
        self.model = model
        self.family = _FAMILY[cfg.model]
        self.center = center
        self.stride = stride
        self.border = border
        in_h, in_w = cfg.eval_in_size
        self.in_hw = (in_h, in_w)
        self.out_hw = (in_h * cfg.scale, in_w * cfg.scale)
        self.sequences = load_manifest(
            cfg.eval_list, cfg.scale, need_blur=self.family in ("vespcn", "frvsr", "duf")
        )
        self._mse_fn = None

    # --- device side ----------------------------------------------------
    def _build_mse_fn(self):
        model, family, cfg = self.model, self.family, self.cfg

        if family == "pfnl":
            def fn(variables, batch_gt):
                lr = downsample(batch_gt, scale=cfg.scale)
                out = model.apply(variables, lr)
                center = batch_gt[:, cfg.num_frames // 2 : cfg.num_frames // 2 + 1]
                mse = jnp.mean((out["sr"] - center) ** 2, axis=(2, 3, 4))
                return mse, out["sr"]
        elif family == "vespcn":
            def fn(variables, batch_lr, batch_gt):
                out = model.apply(variables, batch_lr)
                gt_y = rgb2y(batch_gt)
                mse = jnp.mean((out["sr"] - gt_y) ** 2, axis=(2, 3, 4))
                return mse, out["sr"]
        elif family == "frvsr":
            def fn(variables, batch_lr, batch_gt):
                out = model.apply(variables, batch_lr)
                mse = jnp.mean((out["sr"] - batch_gt) ** 2, axis=(2, 3, 4))
                return mse, out["sr"]
        elif family == "duf":
            def fn(variables, batch_lr, batch_gt):
                out = model.apply(variables, batch_lr, is_train=False)
                mse = jnp.mean((out["sr"] - batch_gt) ** 2, axis=(2, 3, 4))
                return mse, out["sr"]
        else:
            raise ValueError(family)
        return jax.jit(fn)

    def mse_fn(self):
        if self._mse_fn is None:
            self._mse_fn = self._build_mse_fn()
        return self._mse_fn

    # --- host side ------------------------------------------------------
    def _windows(self):
        """Yield per-window (lr_frames|None, gt_frames) numpy stacks."""
        cfg = self.cfg
        t = cfg.num_frames
        in_h, in_w = self.in_hw
        out_h, out_w = self.out_hw
        b, bd = self.border, self.border // cfg.scale
        for seq in self.sequences:
            max_frame = len(seq.truth)
            for idx0 in range(self.center, max_frame, self.stride):
                if self.family == "frvsr":
                    index = _clipped_window(idx0, t // 2, max_frame, t)  # no +1 quirk
                    gt_idx = index
                elif self.family in ("vespcn", "duf"):
                    index = _clipped_window(idx0, t // 2, max_frame, t)
                    gt_idx = [idx0]
                else:  # pfnl: GT window only
                    index = _clipped_window(idx0, t // 2, max_frame, t)
                    gt_idx = index
                gt = np.stack(
                    [
                        imread(seq.truth[i])[b : out_h + b, b : out_w + b].astype(np.float32)
                        / 255.0
                        for i in gt_idx
                    ]
                )
                if self.family == "pfnl":
                    yield None, gt
                else:
                    lr = np.stack(
                        [
                            imread(seq.blur[i])[bd : in_h + bd, bd : in_w + bd].astype(
                                np.float32
                            )
                            / 255.0
                            for i in index
                        ]
                    )
                    yield lr, gt

    def run(self, variables, step: int, log_path: Optional[str] = None,
            print_fn: Callable = print):
        """variables: the full flax variable dict ({"params": ..., and
        "batch_stats" for DUF})."""
        cfg = self.cfg
        fn = self.mse_fn()
        mse_acc, ssim_acc = None, None
        batch_lr, batch_gt, cnt = [], [], 0
        want_ssim = self.family == "vespcn"

        def flush(batch_lr, batch_gt):
            nonlocal mse_acc, ssim_acc, cnt
            gt = jnp.asarray(np.stack(batch_gt))
            if self.family == "pfnl":
                mse, sr = fn(variables, gt)
            else:
                mse, sr = fn(variables, jnp.asarray(np.stack(batch_lr)), gt)
            mse = np.asarray(mse)
            mse_acc = mse if mse_acc is None else np.concatenate([mse_acc, mse], 0)
            if want_ssim:
                # one batched on-device SSIM call (the old host loop
                # serialized O(windows x frames) scipy convolutions)
                gt_y = rgb2y(gt)[:, 0, :, :, 0]
                ssim = np.asarray(compute_ssim_batch(
                    sr[..., 0],
                    jnp.broadcast_to(gt_y[:, None], sr[..., 0].shape),
                    l=1.0,
                ))
                ssim_acc = ssim if ssim_acc is None else np.concatenate([ssim_acc, ssim], 0)
            print_fn(f"\tEval batch {cnt} - {cnt + cfg.eval_batch_size} ...")
            cnt += cfg.eval_batch_size

        for lr, gt in self._windows():
            batch_lr.append(lr)
            batch_gt.append(gt)
            if len(batch_gt) == cfg.eval_batch_size:
                flush(batch_lr, batch_gt)
                batch_lr, batch_gt = [], []
        # leftover windows dropped, like the reference (pfnl.py:127)

        if mse_acc is None:
            raise RuntimeError("no eval batches produced (dataset too small?)")
        psnr_acc = 10 * np.log10(1.0 / mse_acc)
        mse_avg = np.mean(mse_acc, axis=0)
        psnr_avg = np.mean(psnr_acc, axis=0)
        print_fn(f"Eval PSNR: {psnr_avg}, MSE: {mse_avg}")

        if log_path:
            with open(log_path, "a+") as f:
                if want_ssim:
                    q = 1e8
                    ssim_avg = np.mean(ssim_acc, axis=0)
                    m = (mse_avg * q).astype(np.int64) / q
                    p = (psnr_avg * q).astype(np.int64) / q
                    s = (ssim_avg * q).astype(np.int64) / q
                    f.write(
                        "{"
                        + f'"Iter": {step} , "MSE": {m.tolist()}, "PSNR": {p.tolist()}, "SSIM": {s.tolist()}'
                        + "}\n"
                    )
                else:
                    q = 1e6
                    m = (mse_avg * q).astype(np.int64) / q
                    p = (psnr_avg * q).astype(np.int64) / q
                    f.write(
                        "{" + f'"Iter": {step} , "PSNR": {p.tolist()}, "MSE": {m.tolist()}' + "}\n"
                    )
        if want_ssim:
            return psnr_avg, mse_avg, np.mean(ssim_acc, axis=0)
        return psnr_avg, mse_avg
