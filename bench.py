#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.json): HR frames/sec/chip for PFNL 7-frame x4 SR.
Default shape: LR 180x320 -> HR 720x1280 (720p output, the UDM10 geometry).

Methodology: this environment reaches the chip through a relay whose
round-trip latency (~30 ms) dwarfs a single step, and block_until_ready
does not block — so we chain `steps` forward passes inside one lax.scan
(each iteration's input perturbed by the previous output so nothing folds
away), force completion with a scalar readback, and subtract the measured
readback floor.

vs_baseline: the reference publishes NO throughput numbers (SURVEY.md §6).
We normalize against the PFNL paper's reported runtime for 720p x4
(~0.24 s/frame on the authors' GPU => ~4.2 HR frames/sec), the only
reference-derived figure available.  Driver target: >= 10x => vs_baseline
>= 10.
"""

import json
import time

import numpy as np

_REFERENCE_FPS = 4.2  # PFNL paper ~0.24 s per 720p frame (TF1, single GPU)


def _time_chained(fn, *args, repeats: int = 3):
    """Median wall time of fn(*args) forced by scalar readback, minus the
    readback floor."""
    import jax
    import jax.numpy as jnp

    floor_fn = jax.jit(lambda: jnp.float32(1.0))
    float(floor_fn())
    floors = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(floor_fn())
        floors.append(time.perf_counter() - t0)
    floor = float(np.median(floors))

    float(fn(*args))  # compile + warm up
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return max(float(np.median(times)) - floor, 1e-9)


def train_bench(model: str = "pfnl", steps: int = 10, batch: int = 16,
                in_size: int = 32, frames: int = 7, dtype: str = "float32"):
    """Secondary metric (manual use): training steps/sec on one chip —
    the full jitted step incl. on-device augmentation + degradation.
    dtype='bfloat16' measures the mixed-precision training mode."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pfnl_tpu.config import preset
    from pfnl_tpu.models.pfnl import PFNL
    from pfnl_tpu.train.trainer import Trainer
    from pfnl_tpu.data.pipeline import device_augment_and_degrade

    cfg = preset(model, in_size=in_size, batch_size=batch, num_frames=frames,
                 reload=False, compute_dtype=dtype)
    tr = Trainer(cfg, workdir="/tmp/bench_train")
    rng = np.random.default_rng(0)
    gt = (rng.random((batch, frames, cfg.gt_size, cfg.gt_size, 3)) * 255).astype(
        np.uint8
    )
    batch_h = {"gt": jnp.asarray(gt)}
    lr0, _ = device_augment_and_degrade(batch_h, jax.random.PRNGKey(0), "single", 4)
    state = tr.init_state(jax.random.PRNGKey(0), np.asarray(lr0))

    # chain steps inside one scan (one launch) — per-launch relay RTT in
    # this environment would otherwise dominate the measurement
    traced = tr.traced_step_fn(0)

    @jax.jit
    def run_n(state, batch):
        def body(s, i):
            key = jax.random.fold_in(jax.random.PRNGKey(2), i)
            s, losses = traced(s, batch, key)
            return s, losses["loss"]

        return lax.scan(body, state, jnp.arange(steps))

    state2, losses = run_n(state, batch_h)
    loss = float(losses[-1])
    t0 = time.perf_counter()
    _, losses = run_n(state, batch_h)
    loss = float(losses[-1])
    dt = (time.perf_counter() - t0) / steps
    print(
        json.dumps(
            {
                "metric": f"train steps/sec ({model} b{batch} crop {in_size} {dtype})",
                "value": round(1.0 / dt, 3),
                "unit": "steps/sec",
                "vs_baseline": None,
            }
        )
    )
    return 1.0 / dt


def fit_bench(model: str = "pfnl", steps: int = 100, batch: int = 16,
              in_size: int = 32, frames: int = 7):
    """Training steps/sec through the production `Trainer.fit` loop itself
    (dispatch-per-step, divergence checks at log_every cadence) — should
    sit within ~10% of the scan-chained `--train` number now that the
    per-step host readback is gone."""
    import jax
    import jax.numpy as jnp

    from pfnl_tpu.config import preset
    from pfnl_tpu.train.trainer import Trainer

    cfg = preset(model, in_size=in_size, batch_size=batch, num_frames=frames,
                 reload=False)
    tr = Trainer(cfg, workdir="/tmp/bench_fit")
    rng = np.random.default_rng(0)
    gt = (rng.random((batch, frames, cfg.gt_size, cfg.gt_size, 3)) * 255).astype(
        np.uint8
    )

    class _FixedPipeline:
        def __init__(self):
            self.batch = {"gt": jnp.asarray(gt)}

        def get_batch(self):
            return self.batch

    pipe = _FixedPipeline()
    # warm up: compile the step once
    state = tr.fit(pipe, max_steps=1, save_every=10**9, print_fn=lambda *a: None)
    t0 = time.perf_counter()
    # fit()'s final divergence check does a scalar readback of the last
    # step's loss, so wall time here includes full completion (this
    # environment's block_until_ready does not block through the relay)
    state = tr.fit(pipe, state=state, max_steps=1 + steps, save_every=10**9,
                   print_fn=lambda *a: None)
    dt = (time.perf_counter() - t0) / steps
    print(
        json.dumps(
            {
                "metric": f"fit() steps/sec ({model} b{batch} crop {in_size})",
                "value": round(1.0 / dt, 3),
                "unit": "steps/sec",
                "vs_baseline": None,
            }
        )
    )
    return 1.0 / dt


# per-model temporal window (reference configs, SURVEY.md §0) and the
# best-throughput 720p batch that fits one v5e chip (frvsr unrolls 10
# steps and duf carries 52 dense-3D layers — batch 16 crashes the worker)
_MODEL_FRAMES = {"pfnl": 7, "vespcn": 3, "ltdvsr": 5, "mcresnet": 5,
                 "drvsr": 3, "frvsr": 10, "duf": 7}
_MODEL_BATCH = {"pfnl": 16, "vespcn": 16, "ltdvsr": 16, "mcresnet": 16,
                "drvsr": 8, "frvsr": 8, "duf": 1}


def main(model: str = "pfnl", hw: str = "180x320", frames: int = 7,
         steps: int = 10, batch: int = 16, dtype: str = "bfloat16",
         head_impl: str = None):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pfnl_tpu.models import MODEL_REGISTRY

    h, w = (int(v) for v in hw.split("x"))
    kwargs = {"num_frames": frames,
              "dtype": jnp.bfloat16 if dtype == "bfloat16" else jnp.float32}
    if model == "pfnl":
        kwargs["nonlocal_impl"] = "auto"
        if head_impl:
            kwargs["head_impl"] = head_impl
    m = MODEL_REGISTRY[model](**kwargs)

    x = jnp.asarray(
        np.random.default_rng(0).random((batch, frames, h, w, 3), np.float32)
    )
    init_kw = {"is_train": False} if model == "duf" else {}
    if model == "drvsr":
        # production serving keeps sr[:, -1] only (predictor.py) — skip
        # the other T-1 decoder passes like the serving path does
        init_kw = {"last_only": True}
    variables = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x, **init_kw))()

    if model == "frvsr":
        # the production inference path is the STREAMING step (O(1) state,
        # model/frvsr.py:279-303) — scan it over the frames, batched
        out_frames = frames

        @jax.jit
        def chained(variables, x):
            def frame_body(carry, xt):
                xp, est = carry
                sr = m.apply(variables, xt, xp, est, method=m.step)
                return (xt, sr), jnp.mean(sr.astype(jnp.float32))

            def body(c, _):
                x0 = x[:, 0] + c * 1e-12
                sr0 = m.apply(variables, x0, method=m.step)
                _, means = lax.scan(
                    frame_body, (x0, sr0), jnp.moveaxis(x[:, 1:], 1, 0))
                return jnp.mean(means), None

            s, _ = lax.scan(body, jnp.float32(0.0), None, length=steps)
            return s
    else:
        # deliverable throughput: the production sliding-window path
        # (infer/predictor.py) emits ONE HR frame per window even for
        # multi-output models like DRVSR (it keeps sr[:, -1] only), so a
        # window counts as 1 frame regardless of the sr tensor's T dim
        out_frames = 1

        @jax.jit
        def chained(variables, x):
            def body(carry, _):
                out = m.apply(variables, x + carry * 1e-12, **init_kw)["sr"]
                return jnp.mean(out.astype(jnp.float32)), None

            s, _ = lax.scan(body, jnp.float32(0.0), None, length=steps)
            return s

    dt_total = _time_chained(chained, variables, x)
    dt = dt_total / steps
    fps = batch * out_frames / dt

    print(
        json.dumps(
            {
                "metric": f"HR frames/sec/chip ({model} {frames}f x4, {h}x{w}->"
                f"{h*4}x{w*4}, {dtype}, batch {batch})",
                "value": round(fps, 3),
                "unit": "frames/sec",
                # denominator: the PFNL paper's ~0.24 s per 720p frame
                # (~4.2 fps) — the only reference-derived throughput figure
                "vs_baseline": round(fps / _REFERENCE_FPS, 3),
            }
        )
    )
    return fps


def bench_all(hw: str = "180x320", steps: int = 10, batch: int = None,
              dtype: str = "bfloat16"):
    """One JSON line per model family (the regression matrix artifact)."""
    results = {}
    for model, frames in _MODEL_FRAMES.items():
        b = batch or _MODEL_BATCH[model]
        try:
            results[model] = main(model, hw, frames, steps, b, dtype)
        except Exception as e:  # keep the matrix going; record the failure
            print(json.dumps({"metric": f"HR frames/sec/chip ({model})",
                              "value": None, "unit": "frames/sec",
                              "error": str(e)[:200]}))
    return results


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="pfnl")
    ap.add_argument("--hw", default="180x320")
    ap.add_argument("--frames", type=int, default=None,
                    help="default: the model's reference window")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=None,
                    help="default: 16, or per-model table with --all")
    ap.add_argument("--dtype", default=None,
                    help="inference default bfloat16; --train default "
                         "float32 (the reference's training precision)")
    ap.add_argument("--train", action="store_true",
                    help="measure training steps/sec instead of inference fps")
    ap.add_argument("--train-fit", action="store_true",
                    help="measure training steps/sec through Trainer.fit itself")
    ap.add_argument("--all", action="store_true",
                    help="emit one JSON line per model family")
    ap.add_argument("--head-impl", default=None,
                    help="pfnl conv0 head: per_frame | blockdiag (A/B)")
    ap.add_argument("--profile", default=None,
                    help="write a jax.profiler trace to this directory")
    a = ap.parse_args()
    # modes keep their historical defaults: bf16 inference, f32 training
    dt = a.dtype or ("float32" if (a.train or a.train_fit) else "bfloat16")
    # per-model reference window / largest-fitting batch unless overridden
    if a.frames is None:
        a.frames = _MODEL_FRAMES.get(a.model, 7)
    if a.batch is None and not a.all:
        a.batch = _MODEL_BATCH.get(a.model, 16)
    if a.profile:
        import jax

        with jax.profiler.trace(a.profile):
            if a.train:
                train_bench(a.model, a.steps, batch=16, frames=a.frames, dtype=dt)
            else:
                main(a.model, a.hw, a.frames, a.steps, a.batch or 16, dt,
                     a.head_impl)
    elif a.all:
        bench_all(a.hw, a.steps, a.batch, dt)
    elif a.train_fit:
        fit_bench(a.model, max(a.steps, 50), batch=16, frames=a.frames)
    elif a.train:
        train_bench(a.model, a.steps, batch=16, frames=a.frames, dtype=dt)
    else:
        main(a.model, a.hw, a.frames, a.steps, a.batch or 16, dt, a.head_impl)
