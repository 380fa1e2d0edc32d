"""Standalone EasyFlow pre-training (reference modules/model_easyflow.py).

Self-supervised: estimate flow from each Y frame to the (tiled) center
frame, backward-warp the center frame, and minimize photometric L1 +
0.01 * TV of the flow (model_easyflow.py:108-129).  Adam with polynomial
decay 1e-4 -> 1e-6 over 3e5 steps, power 0.9 (model_easyflow.py:155).

The reference reads `input/*.png` from each sequence dir
(model_easyflow.py:55); frame source is configurable here (`subdir`),
defaulting to "input" with a fallback to "truth".  Checkpoints restore
into the SR models' `easyflow` parameter collection (the orbax analogue of
load_easyflow, model_easyflow.py:226-240) via `restore_easyflow_params`.
"""

import glob
import os
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax
import orbax.checkpoint as ocp

from pfnl_tpu.models.flows import EasyFlow
from pfnl_tpu.ops.color import rgb2y
from pfnl_tpu.ops.losses import total_variation
from pfnl_tpu.ops.warp import backward_warp_local


def easyflow_loss(params, model, frames_y):
    """frames_y: [B,T,h,w,1].  Returns (loss, (photometric, tv))."""
    b, t, h, w, _ = frames_y.shape
    ref = jnp.broadcast_to(frames_y[:, t // 2 : t // 2 + 1], frames_y.shape)
    flat = frames_y.reshape(b * t, h, w, 1)
    ref_flat = ref.reshape(b * t, h, w, 1)
    uv = model.apply({"params": params}, flat, ref_flat)
    warped = backward_warp_local(ref_flat, uv, max_disp=2)
    loss_data = jnp.mean(jnp.abs(flat - warped))
    loss_tv = total_variation(uv) / float(np.prod(uv.shape))
    return loss_data + 0.01 * loss_tv, (loss_data, loss_tv)


class EasyFlowTrainer:
    def __init__(
        self,
        train_list: str = "./data/filelist_train.txt",
        save_dir: str = "./easyflow_log/model1/checkpoints",
        num_frames: int = 7,
        crop_size: int = 100,
        batch_size: int = 20,
        learning_rate: float = 1e-4,
        max_steps: int = int(1e6),
        subdir: str = "input",
        seed: int = 0,
    ):
        self.model = EasyFlow()
        self.num_frames = num_frames
        self.crop_size = crop_size
        self.batch_size = batch_size
        self.max_steps = max_steps
        self.save_dir = save_dir
        self.train_list = train_list
        self.subdir = subdir
        self.seed = seed
        self.schedule = optax.polynomial_schedule(
            init_value=learning_rate, end_value=1e-6, power=0.9,
            transition_steps=int(3e5),
        )
        self.tx = optax.chain(optax.scale_by_adam(), optax.scale(-1.0))
        self._step = None

    def _sequences(self):
        with open(self.train_list, "rt") as f:
            dirs = [l for l in f.read().splitlines() if l.strip()]
        seqs = []
        for d in dirs:
            files = sorted(glob.glob(os.path.join(d, self.subdir, "*.png")))
            if not files:
                files = sorted(glob.glob(os.path.join(d, "truth", "*.png")))
            if len(files) >= self.num_frames:
                seqs.append(files)
        if not seqs:
            raise FileNotFoundError(f"no usable sequences in {self.train_list}")
        return seqs

    def sample_batch(self, rng, seqs):
        from pfnl_tpu.utils.image_io import imread

        out = []
        for _ in range(self.batch_size):
            files = seqs[rng.integers(len(seqs))]
            t0 = rng.integers(0, len(files) - self.num_frames + 1)
            frames = [imread(files[i]) for i in range(t0, t0 + self.num_frames)]
            h, w = frames[0].shape[:2]
            y0 = rng.integers(0, h - self.crop_size + 1)
            x0 = rng.integers(0, w - self.crop_size + 1)
            out.append(
                np.stack(
                    [f[y0:y0 + self.crop_size, x0:x0 + self.crop_size] for f in frames]
                )
            )
        return np.stack(out)  # [B,T,S,S,3] uint8

    def step_fn(self):
        if self._step is None:
            def fn(params, opt_state, step, batch_u8):
                frames = batch_u8.astype(jnp.float32) / 255.0
                frames_y = rgb2y(frames)
                (loss, aux), grads = jax.value_and_grad(
                    easyflow_loss, has_aux=True
                )(params, self.model, frames_y)
                lr = self.schedule(step)
                updates, opt_state = self.tx.update(grads, opt_state, params)
                updates = jax.tree.map(lambda u: u * lr, updates)
                params = optax.apply_updates(params, updates)
                return params, opt_state, loss, aux

            self._step = jax.jit(fn)
        return self._step

    def train(self, max_steps: Optional[int] = None, print_fn=print,
              save_every: int = 500, summary_every: int = 10,
              image_summary_every: int = 500):
        """Observability mirrors the reference's TensorBoard usage
        (modules/model_easyflow.py:119-129,173-174,192-195): scalar losses
        every `summary_every` steps (JSONL at <save_dir>/metrics.jsonl)
        and input/flow/warp image dumps every `image_summary_every` steps
        (PNGs under <save_dir>/summaries/)."""
        import json

        seqs = self._sequences()
        rng = np.random.default_rng(self.seed)
        s = self.crop_size
        params = self.model.init(
            jax.random.PRNGKey(self.seed),
            jnp.zeros((1, s, s, 1)), jnp.zeros((1, s, s, 1)),
        )["params"]
        opt_state = self.tx.init(params)
        max_steps = max_steps or self.max_steps
        step_fn = self.step_fn()
        os.makedirs(self.save_dir, exist_ok=True)
        metrics_path = os.path.join(self.save_dir, "metrics.jsonl")
        for step in range(max_steps):
            batch = self.sample_batch(rng, seqs)
            t0 = time.time()
            params, opt_state, loss, (ld, lt) = step_fn(
                params, opt_state, step, jnp.asarray(batch)
            )
            loss = float(loss)
            assert not np.isnan(loss), "Model diverged with loss = NaN"
            dt = time.time() - t0
            if step % 5 == 0:
                print_fn(
                    f"{time.strftime('%Y-%m-%d %H:%M:%S')}: step {step}, "
                    f"loss = {loss * 100:.4f} ({self.batch_size / dt:.1f} data/s)"
                )
            if step % summary_every == 0:
                with open(metrics_path, "at") as f:
                    f.write(json.dumps({
                        "step": step, "loss": loss,
                        "photometric": float(ld), "tv": float(lt),
                        "lr": float(self.schedule(step)),
                        "data_per_sec": self.batch_size / max(dt, 1e-9),
                    }) + "\n")
            if image_summary_every and step % image_summary_every == 0:
                self._image_summaries(params, batch, step)
            if step % save_every == save_every - 1 or step + 1 == max_steps:
                self.save(params, step)
        return params

    def _image_summaries(self, params, batch_u8, step):
        """Dump (input frame, flow color, warped ref) PNGs for the first
        sample — the reference's image summaries as files."""
        from pfnl_tpu.utils.flow_tools import flow_to_color
        from pfnl_tpu.utils.image_io import imsave

        frames = jnp.asarray(batch_u8[:1, :2]).astype(jnp.float32) / 255.0
        y = rgb2y(frames)                      # [1,2,h,w,1]
        src, ref = y[:, 0], y[:, 1]
        uv = self.model.apply({"params": params}, src, ref)
        warped = backward_warp_local(ref, uv, max_disp=2)
        out_dir = os.path.join(self.save_dir, "summaries")
        os.makedirs(out_dir, exist_ok=True)
        to8 = lambda a: np.clip(np.round(np.asarray(a) * 255.0), 0, 255).astype(np.uint8)
        gray = lambda a: np.repeat(to8(a[0]), 3, axis=-1)
        imsave(os.path.join(out_dir, f"{step:08d}_input.png"), gray(src))
        imsave(os.path.join(out_dir, f"{step:08d}_warp.png"), gray(warped))
        imsave(os.path.join(out_dir, f"{step:08d}_flow.png"),
               flow_to_color(np.asarray(uv[0])))

    def save(self, params, step):
        os.makedirs(self.save_dir, exist_ok=True)
        ckptr = ocp.StandardCheckpointer()
        path = os.path.join(os.path.abspath(self.save_dir), f"step_{step:08d}")
        ckptr.save(path, jax.device_get(params), force=True)
        ckptr.wait_until_finished()


def restore_easyflow_params(save_dir: str, template_params):
    """Restore a standalone-EasyFlow checkpoint into an SR model's
    `easyflow` sub-collection (the load_easyflow analogue)."""
    candidates = sorted(glob.glob(os.path.join(os.path.abspath(save_dir), "step_*")))
    if not candidates:
        raise FileNotFoundError(f"no EasyFlow checkpoints under {save_dir}")
    ckptr = ocp.StandardCheckpointer()
    flow = ckptr.restore(candidates[-1], target=template_params["easyflow"])
    out = dict(template_params)
    out["easyflow"] = flow
    return out
