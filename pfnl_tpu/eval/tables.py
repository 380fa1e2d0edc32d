"""Offline parity tables — the framework's analogue of the reference's
MATLAB scripts (matlab/compute_psnr.m, matlab/SSIM.m), which produce the
published Vid4/UDM10 tables from saved result PNGs.

For every sequence directory under a dataset root, compares
`<seq>/<result_name>/NNNN.png` against `<seq>/truth/NNNN.png` on the
Y channel of the uint8 images and reports per-sequence and average
PSNR/SSIM in the README's table layout.
"""

import glob
import os
from typing import Dict, Tuple

import numpy as np

from pfnl_tpu.data.manifest import scan_dataset_dir
from pfnl_tpu.eval.metrics import psnr_y_matlab, ssim_y_matlab
from pfnl_tpu.utils.image_io import imread


def sequence_metrics(seq_dir: str, result_name: str,
                     skip_missing: bool = True) -> Tuple[float, float, int]:
    """(mean PSNR, mean SSIM, #frames) for one sequence."""
    results = sorted(glob.glob(os.path.join(seq_dir, result_name, "*.png")))
    truths = sorted(glob.glob(os.path.join(seq_dir, "truth", "*.png")))
    if not results:
        raise FileNotFoundError(f"no results under {seq_dir}/{result_name}")
    psnrs, ssims = [], []
    for rp, tp in zip(results, truths):
        r = imread(rp)
        t = imread(tp)
        if r.shape != t.shape:
            if skip_missing:
                continue
            raise ValueError(f"shape mismatch {rp} vs {tp}")
        psnrs.append(psnr_y_matlab(r, t))
        ssims.append(ssim_y_matlab(r, t))
    return float(np.mean(psnrs)), float(np.mean(ssims)), len(psnrs)


def dataset_table(dataset_root: str, result_name: str,
                  print_fn=print) -> Dict[str, Tuple[float, float]]:
    """Per-sequence + average PSNR/SSIM over a dataset directory."""
    rows: Dict[str, Tuple[float, float]] = {}
    for seq in scan_dataset_dir(dataset_root):
        try:
            p, s, n = sequence_metrics(seq, result_name)
        except FileNotFoundError:
            continue
        rows[os.path.basename(seq)] = (p, s)
    if not rows:
        raise FileNotFoundError(f"no '{result_name}' results under {dataset_root}")
    print_fn(f"| Sequence | {result_name} |")
    print_fn("|:---:|:---:|")
    for name, (p, s) in rows.items():
        print_fn(f"| {name} | {p:.2f} / {s:.4f} |")
    avg_p = float(np.mean([p for p, _ in rows.values()]))
    avg_s = float(np.mean([s for _, s in rows.values()]))
    print_fn(f"| **average** | **{avg_p:.2f} / {avg_s:.4f}** |")
    rows["average"] = (avg_p, avg_s)
    return rows


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("dataset_root")
    ap.add_argument("result_name")
    a = ap.parse_args()
    dataset_table(a.dataset_root, a.result_name)
