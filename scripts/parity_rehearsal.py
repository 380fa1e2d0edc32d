"""Full-size dress rehearsal of the acceptance pipeline (VERDICT r4
item 7): prove that `TF1 checkpoint -> run.py import-tf1 -> run.py
parity` works end-to-end AT REAL SIZES in one command, so the authors'
real checkpoints + Vid4 (not available in this environment) become a
drop-in.

Stages (each timed):
  1. render a Vid4-SHAPED synthetic dataset: 4 sequences with the real
     Vid4 geometries and frame counts (calendar 41f 576x720, city 34f
     576x704, foliage 49f 480x720, walk 47f 480x720), aliasing-critical
     translating content (truth/ only);
  2. `run.py prepare` renders blur4/ with the reference-bit-matched
     degradation (matlab/generate_LR.m analogue);
  3. synthesize an authors'-LAYOUT full-size PFNL TF1 checkpoint
     (nlvsr scope, 20 blocks, 7 frames, optimizer slots included) via
     the tf_write_ckpt.py subprocess helper — TF never loads here;
  4. `run.py import-tf1 pfnl` converts it to orbax;
  5. `run.py parity pfnl` runs full inference over the dataset and
     prints the README-layout Y-PSNR/SSIM table
     (/root/reference/README.md:79-101 format).

Writes PARITY_REHEARSAL.md (table + per-stage wall clock).

Run from /root/repo (TPU):  python scripts/parity_rehearsal.py
CPU smoke:                  python scripts/parity_rehearsal.py --small
"""

import argparse
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VID4 = [  # name, frames, H, W  (real Vid4 geometry)
    ("calendar", 41, 576, 720),
    ("city", 34, 576, 704),
    ("foliage", 49, 480, 720),
    ("walk", 47, 480, 720),
]
VID4_SMALL = [(n, 18, 96, 112) for n, _, _, _ in VID4]


def render_dataset(root, seqs, seed=0):
    """Aliasing-critical translating scenes at Vid4 geometry (same
    recipe as scripts/convergence.py make_rich_dataset, truth/ only —
    blur4/ comes from `run.py prepare` to exercise that stage)."""
    from pfnl_tpu.utils.image_io import imsave

    rng = np.random.default_rng(seed)
    sig = lambda z: 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))
    for name, nf, h, w in seqs:
        d = os.path.join(root, name, "truth")
        os.makedirs(d, exist_ok=True)
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        v_bg = rng.uniform(-1.2, 1.2, 2)
        gfreq = rng.uniform(0.14, 0.26, 3)
        gth = rng.uniform(0, np.pi, 3)
        gsh = rng.uniform(1.5, 3.0, 3)
        nshape = rng.integers(8, 14)
        scx, scy = rng.uniform(0, w, nshape), rng.uniform(0, h, nshape)
        ssz = rng.uniform(8, 40, (nshape, 2))
        scol = rng.uniform(0.05, 0.95, (nshape, 3))
        v_fg = rng.uniform(-1.2, 1.2, 2)
        for t in range(nf):
            bx, by = xx + v_bg[0] * t, yy + v_bg[1] * t
            chans = []
            for c in range(3):
                ph = gfreq[c] * 2 * np.pi * (np.cos(gth[c]) * bx
                                             + np.sin(gth[c]) * by)
                chans.append(0.5 + 0.22 * np.tanh(gsh[c] * np.sin(ph)))
            img = np.stack(chans, -1)
            fx = (xx - v_fg[0] * t) % w
            fy = (yy - v_fg[1] * t) % h
            for i in range(nshape):
                dx = (fx - scx[i] + w / 2) % w - w / 2
                dy = (fy - scy[i] + h / 2) % h - h / 2
                a = (sig(2.5 * (dx + ssz[i, 0] / 2))
                     * sig(2.5 * (ssz[i, 0] / 2 - dx))
                     * sig(2.5 * (dy + ssz[i, 1] / 2))
                     * sig(2.5 * (ssz[i, 1] / 2 - dy)))
                img = img * (1 - a[..., None]) + a[..., None] * scol[i]
            imsave(os.path.join(d, f"{t:04d}.png"),
                   np.round(np.clip(img, 0, 1) * 255).astype(np.uint8))


def synth_tf1_ckpt(prefix, num_blocks=20, t=7, mf=64, seed=7):
    """Authors'-layout PFNL TF1 checkpoint (reference model/pfnl.py:47-53
    naming) with random weights, written by TF in a subprocess."""
    rng = np.random.default_rng(seed)

    def W(*shape, s=0.05):
        return (rng.standard_normal(shape) * s).astype(np.float32)

    cnl = 3 * t * 4
    tf_vars = {
        "nlvsr/nlblock_0/g/g/kernel": W(1, 1, cnl, cnl),
        "nlvsr/nlblock_0/g/g/bias": W(cnl),
        "nlvsr/nlblock_0/w/w/kernel": W(1, 1, cnl, cnl),
        "nlvsr/nlblock_0/w/w/bias": W(cnl),
        "nlvsr/conv0/kernel": W(5, 5, 3, mf),
        "nlvsr/conv0/bias": W(mf),
        "nlvsr/convmerge1/kernel": W(3, 3, t * mf, 48),
        "nlvsr/convmerge1/bias": W(48),
        "nlvsr/convmerge2/kernel": W(3, 3, 12, 12),
        "nlvsr/convmerge2/bias": W(12),
        # importer must skip optimizer slots + bookkeeping
        "nlvsr/conv0/kernel/Adam": W(5, 5, 3, mf),
        "nlvsr/conv0/kernel/Adam_1": W(5, 5, 3, mf),
        "global_step": np.asarray(150000, np.int64),
    }
    for i in range(num_blocks):
        tf_vars[f"nlvsr/conv1_{i}/kernel"] = W(3, 3, mf, mf)
        tf_vars[f"nlvsr/conv1_{i}/bias"] = W(mf)
        tf_vars[f"nlvsr/conv10_{i}/kernel"] = W(1, 1, t * mf, mf)
        tf_vars[f"nlvsr/conv10_{i}/bias"] = W(mf)
        tf_vars[f"nlvsr/conv2_{i}/kernel"] = W(3, 3, 2 * mf, mf)
        tf_vars[f"nlvsr/conv2_{i}/bias"] = W(mf)

    npz = prefix + ".vars.npz"
    np.savez(npz, **tf_vars)
    helper = os.path.join(REPO, "tests", "tf_write_ckpt.py")
    subprocess.run([sys.executable, helper, npz, prefix], check=True,
                   capture_output=True, text=True, timeout=900)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/vid4_shaped")
    ap.add_argument("--ckdir", default="/tmp/parity_ck")
    ap.add_argument("--out", default="PARITY_REHEARSAL.md")
    ap.add_argument("--small", action="store_true",
                    help="tiny geometry CPU smoke (also forces cpu)")
    a = ap.parse_args()

    if a.small:
        import jax

        jax.config.update("jax_platforms", "cpu")
    seqs = VID4_SMALL if a.small else VID4

    import run

    stages = []

    def stage(name, fn):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        stages.append((name, dt))
        print(f"[rehearsal] {name}: {dt:.1f}s", flush=True)
        return out

    if not os.path.exists(os.path.join(a.root, VID4[0][0], "truth")):
        stage("1 render Vid4-shaped truth",
              lambda: render_dataset(a.root, seqs))
    stage("2 run.py prepare (blur4)",
          lambda: run.main(["prepare", "--root", a.root, "--no-filelists"]))
    ck = os.path.join(a.ckdir, "tf1", "pfnl.ckpt")
    os.makedirs(os.path.dirname(ck), exist_ok=True)
    stage("3 synth TF1 checkpoint", lambda: synth_tf1_ckpt(ck))
    save_dir = os.path.join(a.ckdir, "orbax")
    stage("4 run.py import-tf1", lambda: run.main(
        ["import-tf1", "pfnl", "--ckpt", ck, "--save-dir", save_dir]))
    table = stage("5 run.py parity", lambda: run.main(
        ["parity", "pfnl", "--data", a.root, "--save-dir", save_dir,
         "--name", "rehearsal"]))

    with open(a.out, "wt") as f:
        f.write("# Parity dress rehearsal (synthetic, full size)\n\n")
        f.write(
            "The acceptance gate (<=0.01 dB vs the reference's Vid4/UDM10\n"
            "tables, BASELINE.md) needs the authors' checkpoints + real\n"
            "datasets, which this environment lacks.  This rehearsal runs\n"
            "the ENTIRE offline pipeline at real sizes so those become a\n"
            "drop-in: Vid4-geometry synthetic truth -> `run.py prepare`\n"
            "(bit-matched blur4) -> authors'-layout TF1 checkpoint ->\n"
            "`run.py import-tf1 pfnl` -> `run.py parity` (windowed\n"
            "inference + MATLAB-equivalent Y-PSNR/SSIM table).\n"
            "Command: `python scripts/parity_rehearsal.py`"
            " (scripts/parity_rehearsal.py).\n\n")
        f.write("| stage | wall clock |\n|---|---:|\n")
        for name, dt in stages:
            f.write(f"| {name} | {dt:.1f}s |\n")
        f.write("\n## Y-channel table (README layout; random weights, "
                "so the numbers only prove the plumbing)\n\n```\n")
        f.write(str(table))
        f.write("\n```\n")
    print(f"wrote {a.out}", flush=True)


if __name__ == "__main__":
    main()
