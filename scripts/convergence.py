"""Convergence evidence: train every model family on rich synthetic data
and record the eval-PSNR curve (VERDICT r1 item 5).

Synthetic sequences are multi-octave textures translating with per-channel
velocities (more structure than tests/util_data), 20 frames, so both the
training producers and the evaluator protocol (center=15, stride 32)
operate as on real data.  Each family trains `--steps` steps with the
periodic evaluator; the PSNR curve is parsed from the eval log and
written to CONVERGENCE.md together with two mechanism checks:

  * staged switch (VESPCN): the flow subnet is frozen during stage 0 and
    starts moving after `stage_switch_step` (fresh stage-1 Adam state);
  * DRVSR's LSTM-only clip_by_global_norm(3) transform is present.

Run:  python scripts/convergence.py --steps 2000 --out CONVERGENCE.md
"""

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODELS = ["pfnl", "vespcn", "ltdvsr", "mcresnet", "drvsr", "frvsr", "duf"]


def make_rich_dataset(root, num_seqs=6, num_frames=20, hw=(160, 256), seed=0):
    """Translating multi-octave textures + moving blobs; renders truth/ and
    blur4/ and writes train/val filelists."""
    import jax.numpy as jnp

    from pfnl_tpu.ops.degrade import downsample_4d
    from pfnl_tpu.utils.image_io import imsave

    rng = np.random.default_rng(seed)
    h, w = hw
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    seq_dirs = []
    for s in range(num_seqs):
        d = os.path.join(root, f"seq_{s:03d}")
        os.makedirs(os.path.join(d, "truth"), exist_ok=True)
        os.makedirs(os.path.join(d, "blur4"), exist_ok=True)
        vel = rng.uniform(-3, 3, (3, 2))
        phase = rng.random((3, 3)) * 6.28
        freqs = rng.uniform(0.02, 0.35, (3, 3))
        cx, cy = rng.uniform(0.2, 0.8, 2) * (w, h)
        frames = []
        for t in range(num_frames):
            chans = []
            for c in range(3):
                ox, oy = vel[c] * t
                v = sum(
                    (0.5 / (o + 1)) * np.sin(
                        2 * np.pi * freqs[c, o] * (xx + ox)
                        + 2 * np.pi * freqs[c, (o + 1) % 3] * (yy + oy)
                        + phase[c, o])
                    for o in range(3)
                )
                blob = 0.4 * np.exp(
                    -(((xx - cx - 4 * t) % w - w / 2) ** 2
                      + ((yy - cy - 2 * t) % h - h / 2) ** 2) / 400.0)
                chans.append(0.5 + 0.25 * v + blob)
            img = np.clip(np.stack(chans, -1), 0, 1).astype(np.float32)
            frames.append(img)
            imsave(os.path.join(d, "truth", f"{t:04d}.png"),
                   np.round(img * 255).astype(np.uint8))
        lr = np.asarray(downsample_4d(jnp.asarray(np.stack(frames)), scale=4))
        for t in range(num_frames):
            imsave(os.path.join(d, "blur4", f"{t:04d}.png"),
                   np.round(np.clip(lr[t], 0, 1) * 255).astype(np.uint8))
        seq_dirs.append(d)
    ntrain = max(1, num_seqs - 2)
    train_list = os.path.join(root, "filelist_train.txt")
    val_list = os.path.join(root, "filelist_val.txt")
    open(train_list, "wt").write("\n".join(seq_dirs[:ntrain]) + "\n")
    open(val_list, "wt").write("\n".join(seq_dirs[ntrain:]) + "\n")
    return train_list, val_list


def run_family(model, train_list, val_list, steps, eval_every, workroot):
    import jax
    import jax.numpy as jnp

    from pfnl_tpu.config import preset
    from pfnl_tpu.data.manifest import load_manifest
    from pfnl_tpu.data.pipeline import TrainPipeline
    from pfnl_tpu.eval.evaluator import Evaluator
    from pfnl_tpu.train.trainer import Trainer

    over = dict(train_list=train_list, eval_list=val_list, reload=False,
                eval_in_size=(32, 56), eval_batch_size=2,
                save_dir=os.path.join(workroot, model))
    if model == "drvsr":
        over["in_size"] = 32   # reference LR crop is 100; smaller here so
        over["batch_size"] = 4  # the synthetic frames (160x256) suffice
    cfg = preset(model, **over)
    # stage engagement within the short run
    staged = cfg.stage_switch_step is not None
    if staged:
        cfg = preset(model, stage_switch_step=steps // 2, **over)
    log_path = os.path.join(workroot, f"{model}.txt")
    if os.path.exists(log_path):
        os.remove(log_path)

    tr = Trainer(cfg)
    seqs = load_manifest(cfg.train_list, cfg.scale,
                         need_blur=cfg.producer != "single")
    pipe = TrainPipeline(seqs, cfg.producer, cfg.num_frames, cfg.in_size,
                         cfg.scale, cfg.batch_size, seed=cfg.seed,
                         num_threads=2, prefetch=4)
    ev = Evaluator(cfg, tr.model)

    flow_snap = {}

    def eval_fn(state, step):
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        ev.run(variables, step, log_path=log_path, print_fn=lambda *a: None)
        if staged:
            fl = [k for k in state.params if k in ("easyflow", "flow", "flownet")]
            if fl:
                flow_snap[step] = jax.device_get(
                    jax.tree.leaves(state.params[fl[0]])[0])

    t0 = time.time()
    state = tr.fit(pipe, max_steps=steps, eval_fn=eval_fn,
                   save_every=eval_every, print_fn=lambda *a: None)
    pipe.close()
    wall = time.time() - t0

    curve = []
    for line in open(log_path):
        rec = json.loads(line.replace(" ,", ","))
        p = rec["PSNR"]
        curve.append((rec["Iter"], float(np.mean(p))))

    checks = {}
    if staged:
        s0 = sorted(k for k in flow_snap if k <= cfg.stage_switch_step)
        s1 = sorted(k for k in flow_snap if k > cfg.stage_switch_step)
        if len(s0) >= 2:
            checks["flow_frozen_stage0"] = bool(
                np.array_equal(flow_snap[s0[0]], flow_snap[s0[-1]]))
        if s0 and s1:
            checks["flow_moves_stage1"] = not np.array_equal(
                flow_snap[s0[-1]], flow_snap[s1[-1]])
    if model == "drvsr":
        # the LSTM-only clip mask must actually select parameters
        from pfnl_tpu.train.trainer import _lstm_mask

        mask = _lstm_mask(state.params)
        checks["lstm_clip_selects_params"] = bool(
            any(jax.tree.leaves(mask)))
    return curve, checks, wall, int(state.step)


def assemble(workroot, out, steps, note=""):
    """Rebuild the report from the per-model eval logs (usable after a
    partially-completed sweep)."""
    results = {}
    for m in MODELS:
        log_path = os.path.join(workroot, f"{m}.txt")
        if not os.path.exists(log_path):
            continue
        curve = []
        for line in open(log_path):
            rec = json.loads(line.replace(" ,", ","))
            curve.append((rec["Iter"], float(np.mean(rec["PSNR"]))))
        if curve:
            results[m] = curve
    with open(out, "wt") as f:
        f.write("# Convergence evidence (synthetic data)\n\n")
        f.write(
            "Each family trained with its reference preset (DRVSR at a\n"
            "reduced LR crop 32/batch 4 so 160x256 synthetic frames\n"
            "suffice; staged models switch at steps/2 to exercise stage 1)\n"
            f"for up to {steps} steps on translating multi-octave textures\n"
            "(scripts/convergence.py, single v5e chip).  Eval protocol:\n"
            "center=15/stride-32 windows, 32x56 LR crops, PSNR on RGB MSE\n"
            "— the reference's training-log metric, NOT the MATLAB table\n"
            "metric.  Synthetic textures bound the achievable PSNR; the\n"
            "evidence is the monotone climb, not the absolute value.\n"
            + note + "\n\n")
        for m, curve in results.items():
            f.write(f"## {m}\n\n| step | eval PSNR (dB) |\n|---:|---:|\n")
            for st, p in curve:
                f.write(f"| {st} | {p:.2f} |\n")
            finite = [(st, p) for st, p in curve if np.isfinite(p) and p > -100]
            if finite:
                f.write(f"\ndelta: {finite[-1][1] - finite[0][1]:+.2f} dB "
                        f"(step {finite[0][0]} -> {finite[-1][0]})\n\n")
    print(f"wrote {out} ({len(results)} families)", flush=True)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--eval-every", type=int, default=250)
    ap.add_argument("--models", nargs="*", default=MODELS)
    ap.add_argument("--root", default="/tmp/conv_ds")
    ap.add_argument("--workroot", default="/tmp/conv_runs")
    ap.add_argument("--out", default="CONVERGENCE.md")
    ap.add_argument("--assemble-only", action="store_true")
    a = ap.parse_args()
    if a.assemble_only:
        assemble(a.workroot, a.out, a.steps)
        return

    if not os.path.exists(os.path.join(a.root, "filelist_train.txt")):
        shutil.rmtree(a.root, ignore_errors=True)
        os.makedirs(a.root, exist_ok=True)
        print("generating synthetic dataset ...", flush=True)
        make_rich_dataset(a.root)
    train_list = os.path.join(a.root, "filelist_train.txt")
    val_list = os.path.join(a.root, "filelist_val.txt")
    os.makedirs(a.workroot, exist_ok=True)

    results = {}
    for m in a.models:
        print(f"=== {m}: {a.steps} steps ===", flush=True)
        try:
            curve, checks, wall, step = run_family(
                m, train_list, val_list, a.steps, a.eval_every, a.workroot)
            results[m] = dict(curve=curve, checks=checks, wall=wall, step=step)
            print(f"{m}: {curve} checks={checks} ({wall:.0f}s)", flush=True)
        except Exception as e:
            import traceback
            traceback.print_exc()
            results[m] = dict(error=str(e)[:300])

    with open(a.out, "wt") as f:
        f.write("# Convergence evidence (synthetic data)\n\n")
        f.write(
            "Each family trained with its reference preset (DRVSR at a\n"
            "reduced LR crop 32/batch 4 so 160x256 synthetic frames\n"
            "suffice; staged models switch at steps/2 to exercise stage 1)\n"
            f"on {a.steps} steps of translating multi-octave textures;\n"
            "eval protocol: center=15/stride-32 windows, 32x56 LR, PSNR on\n"
            "RGB MSE (the reference's training-log metric).  Generated by\n"
            "scripts/convergence.py on a single v5e chip.\n\n")
        for m, r in results.items():
            f.write(f"## {m}\n\n")
            if "error" in r:
                f.write(f"FAILED: {r['error']}\n\n")
                continue
            f.write("| step | eval PSNR (dB) |\n|---:|---:|\n")
            for s, p in r["curve"]:
                f.write(f"| {s} | {p:.2f} |\n")
            first, last = r["curve"][0][1], r["curve"][-1][1]
            f.write(f"\ndelta: {last - first:+.2f} dB over the run "
                    f"({r['wall']:.0f}s wall)\n")
            if r["checks"]:
                f.write(f"checks: {r['checks']}\n")
            f.write("\n")
    print(f"wrote {a.out}", flush=True)


if __name__ == "__main__":
    main()
