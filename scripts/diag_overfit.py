"""Root-cause diagnostic for the r4 convergence regression (VERDICT r4
item 1): vespcn's eval PSNR DECLINES over 10k steps on the synthetic
protocol.  Three hypotheses to discriminate:

  (H1) overfitting — the 21 training sequences are memorized; eval on
       *training* sequences rises while val falls;
  (H2) warp damage — the (random-then-jointly-trained) flow net's warps
       actively destroy the trunk's input; a zero-flow (identity-warp)
       ablation does NOT decline;
  (H3) optimizer/implementation bug — train loss itself stops improving
       or the train-sequence eval also declines with zero flow.

Each variant trains vespcn for --steps on the r4 dataset (regenerated
bit-identically, seed 0) and evaluates every --eval-every on BOTH the
val list and a train-subset list.  The zero-flow variant zeroes the
easyflow c5/s5 kernel+bias at init (tanh(0)=0 -> uv=0 -> identity splat,
models/vespcn.py:75) and never leaves stage 0, so flow stays exactly
zero for the whole run.

Run:  python scripts/diag_overfit.py --steps 2000
"""

import argparse
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from convergence import make_rich_dataset  # noqa: E402  (scripts/)


def run_variant(name, model, train_list, val_list, train_eval_list, steps,
                eval_every, workroot, zero_flow=False, velocity_note=""):
    import jax
    import jax.numpy as jnp

    from pfnl_tpu.config import preset
    from pfnl_tpu.data.manifest import load_manifest
    from pfnl_tpu.data.pipeline import TrainPipeline, device_augment_and_degrade
    from pfnl_tpu.eval.evaluator import Evaluator
    from pfnl_tpu.train.trainer import Trainer

    over = dict(train_list=train_list, eval_list=val_list, reload=False,
                eval_in_size=(32, 56), eval_batch_size=2,
                save_dir=os.path.join(workroot, name))
    over["decay_step"] = float(steps)
    over["max_step"] = steps + 1
    over["stage_switch_step"] = 10 ** 9 if zero_flow else steps // 2
    cfg = preset(model, **over)
    cfg_tr = preset(model, **{**over, "eval_list": train_eval_list})

    tr = Trainer(cfg)
    seqs = load_manifest(cfg.train_list, cfg.scale,
                         need_blur=cfg.producer != "single")
    pipe = TrainPipeline(seqs, cfg.producer, cfg.num_frames, cfg.in_size,
                         cfg.scale, cfg.batch_size, seed=cfg.seed,
                         num_threads=2, prefetch=4)
    ev_val = Evaluator(cfg, tr.model)
    ev_tr = Evaluator(cfg_tr, tr.model)

    state = None
    if zero_flow:
        assert model in ("vespcn", "ltdvsr", "mcresnet", "drvsr"), (
            f"zero-flow ablation needs an easyflow family, not {model!r}")
        batch0 = pipe.get_batch()
        lr0, _ = device_augment_and_degrade(
            jax.tree.map(jnp.asarray, batch0), jax.random.PRNGKey(0),
            cfg.producer, cfg.scale)
        state = tr.init_state(jax.random.PRNGKey(cfg.seed), np.asarray(lr0))
        p = jax.device_get(state.params)
        for lay in ("c5", "s5"):
            for leaf in ("kernel", "bias"):
                p["easyflow"][lay][leaf] = np.zeros_like(
                    p["easyflow"][lay][leaf])
        state = state.replace(params=jax.tree.map(jnp.asarray, p))
        # re-init optimizer state so Adam moments match the zeroed params
        state = state.replace(
            opt_states=tuple(tx.init(state.params) for tx in tr.txs))

    curves = {"val": [], "train": []}
    loss_hist = []

    def eval_fn(st, step):
        variables = {"params": st.params}
        if st.batch_stats is not None:
            variables["batch_stats"] = st.batch_stats
        pv, _ = ev_val.run(variables, step, print_fn=lambda *a: None)[:2]
        pt, _ = ev_tr.run(variables, step, print_fn=lambda *a: None)[:2]
        curves["val"].append((step, float(np.mean(pv))))
        curves["train"].append((step, float(np.mean(pt))))
        w = [v for s, v in loss_hist if step - eval_every <= s < step]
        print(f"[{name}] step {step}: val {float(np.mean(pv)):.2f} dB, "
              f"train-seq {float(np.mean(pt)):.2f} dB, "
              f"train-loss {np.mean(w) if w else float('nan'):.4f}",
              flush=True)

    loss_re = re.compile(r"Step:(\d+), loss:([0-9.eE+-]+)")

    def print_fn(msg):
        m = loss_re.search(str(msg))
        if m:
            loss_hist.append((int(m.group(1)), float(m.group(2))))

    t0 = time.time()
    state = tr.fit(pipe, state=state, max_steps=steps, eval_fn=eval_fn,
                   save_every=eval_every, print_fn=print_fn)
    pipe.close()
    if zero_flow:
        # invariant: flow params must not have moved
        p = jax.device_get(state.params)
        assert np.all(p["easyflow"]["c5"]["kernel"] == 0), "flow moved!"
    return dict(curves=curves, loss=loss_hist, wall=time.time() - t0,
                zero_flow=zero_flow, note=velocity_note)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--eval-every", type=int, default=250)
    ap.add_argument("--model", default="vespcn")
    ap.add_argument("--root", default="/tmp/conv_ds")
    ap.add_argument("--workroot", default="/tmp/diag_runs")
    ap.add_argument("--out", default="/tmp/diag_overfit.json")
    ap.add_argument("--variants", nargs="*", default=["baseline", "zeroflow"])
    a = ap.parse_args()

    if not os.path.exists(os.path.join(a.root, "filelist_train.txt")):
        os.makedirs(a.root, exist_ok=True)
        print("generating synthetic dataset ...", flush=True)
        make_rich_dataset(a.root)
    train_list = os.path.join(a.root, "filelist_train.txt")
    val_list = os.path.join(a.root, "filelist_val.txt")
    # train-subset eval list: first 3 training sequences
    train_eval_list = os.path.join(a.workroot, "filelist_train_eval.txt")
    os.makedirs(a.workroot, exist_ok=True)
    with open(train_list) as f:
        head = [ln.strip() for ln in f if ln.strip()][:3]
    with open(train_eval_list, "wt") as f:
        f.write("\n".join(head) + "\n")

    results = {}
    for v in a.variants:
        print(f"=== variant {v} ===", flush=True)
        results[v] = run_variant(
            f"{a.model}_{v}", a.model, train_list, val_list, train_eval_list,
            a.steps, a.eval_every, a.workroot, zero_flow=(v == "zeroflow"))
        with open(a.out, "wt") as f:
            json.dump(results, f, indent=1)
    print(f"wrote {a.out}", flush=True)


if __name__ == "__main__":
    main()
