"""Inference API — preserves the reference's public surface
(BASELINE.json: `testvideo()`/`testvideos()`):

  * test_video_truth(path, name, part): read `truth/*.png`, degrade
    ON DEVICE, slide edge-clamped temporal windows, run chunked batches,
    save PNGs, print total/avg seconds excluding the first (warm-up) chunk
    (reference model/pfnl.py:203-262).
  * test_video_lr(path, name, part): same from pre-rendered `blur{s}/*.png`
    (model/pfnl.py:264-320).
  * testvideo(path, name): single sequence (VESPCN-family naming,
    model/vespcn.py:298-370).
  * testvideos(path, start, name): iterate a dataset directory
    (model/pfnl.py:322-332) — signature (path, start, name) preserved.

Family behaviours:
  * RGB models (pfnl, frvsr): save the model output directly.
  * Y models (vespcn/mcresnet/ltdvsr/drvsr): SR the Y channel, upscale
    CbCr bicubically, convert ycbcr2rgb (model/vespcn.py:334-346); inputs
    padded to a multiple of 4 with edge padding, output cropped back.
  * frvsr: stateful frame-by-frame recurrence with O(1) state
    (model/frvsr.py:269-310).

TPU notes: chunk shapes are static — the last ragged chunk is PADDED to
the chunk size and the extras dropped, so jit compiles each video ONCE
(the reference rebuilds its graph per distinct shape, pfnl.py:220).
"""

import os
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from pfnl_tpu.config import Config
from pfnl_tpu.data.manifest import scan_dataset_dir
from pfnl_tpu.ops.color import rgb2ycbcr, ycbcr2rgb
from pfnl_tpu.ops.degrade import downsample_4d
from pfnl_tpu.ops.resize import resize_bicubic
from pfnl_tpu.utils.image_io import imread, imsave, to_uint8_img, automkdir

_RGB_MODELS = ("pfnl", "frvsr")
_Y_MODELS = ("vespcn", "mcresnet", "ltdvsr", "drvsr")


def make_serving_fn(model_name: str, model, num_frames: int):
    """(per_chip_fn, out_ndim): the COMPLETE per-chip serving program for a
    window batch [B,T,h,w,3] — for Y-channel families this includes the
    reference's RGB reconstruction (SR Y + bicubically upscaled CbCr ->
    ycbcr2rgb, model/vespcn.py:334-346), so exported artifacts and the
    multi-chip shard_map path deliver final RGB frames, not a Y channel
    needing model-repo post-processing."""
    if model_name in _Y_MODELS:
        t = num_frames
        # DRVSR: only the last frame's decode is delivered (reference
        # model/drvsr.py:505) — skip the other T-1 decoder passes
        kw = {"last_only": True} if model_name == "drvsr" else {}

        def fn(v, clip):
            sr_y = model.apply(v, clip, **kw)["sr"][:, -1]  # [B,H',W',1]
            center = clip[:, t // 2]
            ycc = rgb2ycbcr(center)
            cbcr = resize_bicubic(ycc, (sr_y.shape[1], sr_y.shape[2]))[..., 1:3]
            return ycbcr2rgb(jnp.concatenate([sr_y, cbcr], axis=-1))

        return fn, 4
    if model_name == "duf":
        return (lambda v, x: model.apply(v, x, is_train=False)["sr"]), 5
    return (lambda v, x: model.apply(v, x)["sr"]), 5


def _clipped_windows(num_frames: int, t: int) -> np.ndarray:
    """[F, T] edge-clamped sliding-window indices (pfnl.py:238-241)."""
    idx = np.arange(num_frames)[:, None] + np.arange(t)[None, :] - t // 2
    return np.clip(idx, 0, num_frames - 1)


class Predictor:
    def __init__(self, cfg: Config, model, variables, batch_windows: int = 4,
                 mesh=None):
        """batch_windows: minimum windows per device step for the
        window-batched models (the reference's part=1000 implies batch-1;
        batching ~doubles chip throughput — conscious perf deviation).

        mesh: optional `jax.sharding.Mesh` — multi-chip serving.  The
        window batch is sharded over the flat device axis via `shard_map`
        (parallel/spmd.py::sharded_apply_dp) so each chip runs the full
        per-chip program, Pallas kernels included.  The recurrent FRVSR
        path stays single-chip (its state feedback is latency-, not
        throughput-bound)."""
        self.cfg = cfg
        self.model = model
        self.variables = variables
        self.mesh = mesh
        if mesh is not None:
            n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
            batch_windows = -(-batch_windows // n_dev) * n_dev
            self._n_dev = n_dev
        else:
            self._n_dev = 1
        self.batch_windows = batch_windows
        self._fwd = None
        self._degrade = jax.jit(lambda x: downsample_4d(x, scale=cfg.scale))

    def _jit_batched(self, per_chip, nd_out=5):
        """jit for single-chip; shard_map-over-batch for a mesh.  Either
        way the returned callable takes (variables, x) per call."""
        if self.mesh is None:
            return jax.jit(per_chip)
        from pfnl_tpu.parallel.spmd import sharded_apply_dp

        call = sharded_apply_dp(per_chip, self.mesh)
        return lambda v, x: call(v, x, nd_out)

    # --- jitted forwards ------------------------------------------------
    def _forward(self):
        if self._fwd is None:
            cfg, model = self.cfg, self.model
            if cfg.model == "duf":
                self._fwd = self._jit_batched(
                    lambda v, x: model.apply(v, x, is_train=False)["sr"]
                )
            else:
                self._fwd = self._jit_batched(lambda v, x: model.apply(v, x)["sr"])
        return self._fwd

    def _degrade_video(self, imgs: np.ndarray, chunk: int = 16) -> np.ndarray:
        """HR video [F,H,W,3] float -> LR [F,h,w,3], chunked on device."""
        outs = []
        f = imgs.shape[0]
        for i in range(0, f, chunk):
            part = imgs[i : i + chunk]
            pad = 0
            if part.shape[0] < chunk and f > chunk:
                pad = chunk - part.shape[0]
                part = np.concatenate([part, part[-1:].repeat(pad, 0)])
            out = np.asarray(self._degrade(jnp.asarray(part)))
            outs.append(out[: out.shape[0] - pad] if pad else out)
        return np.concatenate(outs, 0)

    # --- window-batched path (pfnl / duf) -------------------------------
    def _run_windows(self, lrs: np.ndarray, save_path: str, part: int):
        cfg = self.cfg
        t = cfg.num_frames
        # pad LR frames to an even size (PFNL's space_to_depth needs it;
        # the reference simply crashes on odd sizes) and crop the HR output
        h0, w0 = lrs.shape[1], lrs.shape[2]
        padh, padw = (-h0) % 2, (-w0) % 2
        if padh or padw:
            lrs = np.pad(lrs, [[0, 0], [0, padh], [0, padw], [0, 0]], "edge")
        out_h, out_w = h0 * cfg.scale, w0 * cfg.scale
        max_frame = lrs.shape[0]
        part = min(part, max_frame)
        num_once = max_frame // part + (0 if max_frame % part == 0 else 1)
        num_once = min(max(num_once, self.batch_windows), max_frame)
        num_once = -(-num_once // self._n_dev) * self._n_dev
        windows = _clipped_windows(max_frame, t)  # [F, T]
        fwd = self._forward()

        print(f"Save at {save_path}")
        print(f"{max_frame} Inputs With Shape {lrs.shape[1:]}")
        all_time = []
        n_chunks = (max_frame + num_once - 1) // num_once

        def flush(dev_sr, n_valid, base):
            sr = np.asarray(dev_sr)  # blocks until the chunk is computed
            for j in range(n_valid):
                imsave(
                    os.path.join(save_path, f"{base + j:0>4}.png"),
                    to_uint8_img(sr[j][0][:out_h, :out_w]),
                )

        # Double-buffered: chunk i's PNG encode overlaps the device compute
        # of chunk i+1 (dispatch is async; np.asarray forces completion).
        # Chunk 0 stays synchronous so the compile lands in all_time[0],
        # which the reference-style average already excludes (pfnl.py:262).
        pending = None  # (device result, n_valid, first frame index)
        for i in range(n_chunks):
            sel = windows[i * num_once : (i + 1) * num_once]
            pad = num_once - sel.shape[0]
            if pad:
                sel = np.concatenate([sel, sel[-1:].repeat(pad, 0)])
            batch = lrs[sel]  # [num_once, T, h, w, 3]
            st = time.time()
            dev = fwd(self.variables, jnp.asarray(batch))
            if i == 0:
                flush(dev, num_once - pad, 0)
            else:
                if pending is not None:
                    flush(*pending)
                pending = (dev, num_once - pad, i * num_once)
            all_time.append(time.time() - st)
        if pending is not None:
            st = time.time()
            flush(*pending)
            all_time[-1] += time.time() - st
        all_time = np.array(all_time)
        if max_frame > 0:
            avg = np.mean(all_time[1:]) if len(all_time) > 1 else float(all_time[0])
            print(f"spent {np.sum(all_time)} s in total and {avg} s in average")
        return all_time

    # --- Y-channel path (vespcn family) ---------------------------------
    def _run_y_frames(self, lrs: np.ndarray, save_path: str, part: int = 1000):
        """Window-BATCHED Y-channel inference (the reference runs these
        models one frame per sess.run, vespcn.py:330-346 — batching is a
        conscious chip-throughput improvement; outputs are identical)."""
        cfg = self.cfg
        t = cfg.num_frames
        max_frame, h, w, _ = lrs.shape
        padh = (-h) % 4
        padw = (-w) % 4
        lrs_p = np.pad(lrs, [[0, 0], [0, padh], [0, padw], [0, 0]], "edge")
        windows = _clipped_windows(max_frame, t)
        out_h, out_w = h * cfg.scale, w * cfg.scale
        part = min(part, max(max_frame, 1))
        num_once = max_frame // part + (0 if max_frame % part == 0 else 1)
        num_once = min(max(num_once, self.batch_windows), max(max_frame, 1))
        num_once = -(-num_once // self._n_dev) * self._n_dev

        rgb_of, nd_out = make_serving_fn(cfg.model, self.model, t)
        rgb_of = self._jit_batched(rgb_of, nd_out=nd_out)

        print(f"Save at {save_path}")
        print(f"{max_frame} Inputs With Shape {lrs.shape[1:]}")
        all_time = []
        n_chunks = (max_frame + num_once - 1) // num_once

        def flush(dev_rgb, n_valid, base):
            rgb = np.asarray(dev_rgb)
            for j in range(n_valid):
                imsave(
                    os.path.join(save_path, f"{base + j:0>4}.png"),
                    to_uint8_img(rgb[j, :out_h, :out_w]),
                )

        # double-buffered like _run_windows: PNG encode of chunk i overlaps
        # the device compute of chunk i+1
        pending = None
        for i in range(n_chunks):
            sel = windows[i * num_once : (i + 1) * num_once]
            pad = num_once - sel.shape[0]
            if pad:
                sel = np.concatenate([sel, sel[-1:].repeat(pad, 0)])
            batch = lrs_p[sel]  # [num_once, T, h', w', 3]
            st = time.time()
            dev = rgb_of(self.variables, jnp.asarray(batch))
            if i == 0:
                flush(dev, num_once - pad, 0)
            else:
                if pending is not None:
                    flush(*pending)
                pending = (dev, num_once - pad, i * num_once)
            all_time.append(time.time() - st)
        if pending is not None:
            st = time.time()
            flush(*pending)
            all_time[-1] += time.time() - st
        all_time = np.array(all_time)
        if max_frame > 0:
            avg = np.mean(all_time[1:]) if len(all_time) > 1 else float(all_time[0])
            print(f"spent {np.sum(all_time)} s in total and {avg} s in average")
        return all_time

    # --- frvsr streaming path -------------------------------------------
    def _run_recurrent(self, lrs: np.ndarray, save_path: str,
                       chunk_frames: int = 32):
        """O(1)-state recurrence, dispatched one CHUNK of frames per device
        call: the per-frame state feedback runs inside a `lax.scan`, so a
        video costs ceil(F/chunk) host round-trips instead of F (the
        reference feeds state back through placeholders per frame,
        model/frvsr.py:279-303 — identical math, relay-RTT-free here).
        The carried state crosses chunks on device-side arrays."""
        if chunk_frames < 1:
            raise ValueError(f"chunk_frames must be >= 1, got {chunk_frames}")
        model = self.model
        step0 = jax.jit(lambda v, x: model.apply(v, x, method=model.step))

        @jax.jit
        def run_chunk(v, frames, xp, est):
            # frames [K,1,h,w,3]; carry = (prev LR, prev SR)
            def body(carry, xt):
                xp, est = carry
                sr = model.apply(v, xt, xp, est, method=model.step)
                return (xt, sr), sr

            (_, _), srs = jax.lax.scan(body, (xp, est), frames)
            return srs  # [K,1,H,W,3]

        print(f"Save at {save_path}")
        print(f"{lrs.shape[0]} Inputs With Shape {lrs.shape[1:]}")
        all_time = []
        f = lrs.shape[0]
        if f == 0:
            return np.array(all_time)
        st = time.time()
        sr = step0(self.variables, jnp.asarray(lrs[0:1]))
        sr0 = np.asarray(sr)
        all_time.append(time.time() - st)
        imsave(os.path.join(save_path, "0000.png"), to_uint8_img(sr0[0]))
        kc = min(chunk_frames, f - 1) if f > 1 else 0

        def flush(dev_srs, k, base):
            srs_n = np.asarray(dev_srs)[:k]
            for j in range(k):
                imsave(os.path.join(save_path, f"{base + j:0>4}.png"),
                       to_uint8_img(srs_n[j, 0]))

        # double-buffered: the carry (srs[k-1]) stays a device array, so
        # chunk i+1 dispatches before chunk i's frames are materialized;
        # chunk i's PNG encode then overlaps chunk i+1's compute
        pending = None  # (device srs, k, first frame index)
        i = 1
        while i < f:
            k = min(kc, f - i)
            part = lrs[i : i + k]
            if k < kc:  # pad the ragged tail chunk — ONE compile per video
                part = np.concatenate([part, part[-1:].repeat(kc - k, 0)])
            frames = jnp.asarray(part)[:, None]  # [KC,1,h,w,3]
            st = time.time()
            srs = run_chunk(self.variables, frames, jnp.asarray(lrs[i - 1 : i]), sr)
            sr = srs[k - 1]
            if pending is not None:
                flush(*pending)
            pending = (srs, k, i)
            all_time.append(time.time() - st)
            i += k
        if pending is not None:
            st = time.time()
            flush(*pending)
            all_time[-1] += time.time() - st
        all_time = np.array(all_time)
        # 'average' stays PER FRAME (the reference's per-frame print,
        # model/frvsr.py:301), excluding the warm-up first dispatch
        avg = (np.sum(all_time[1:]) / (f - 1)) if f > 1 else float(all_time[0])
        print(f"spent {np.sum(all_time)} s in total and {avg} s in average")
        return all_time

    # --- public API ------------------------------------------------------
    def _dispatch(self, lrs: np.ndarray, save_path: str, part: int):
        automkdir(save_path)
        if self.cfg.model == "frvsr":
            return self._run_recurrent(lrs, save_path)
        if self.cfg.model in _Y_MODELS:
            return self._run_y_frames(lrs, save_path, part)
        return self._run_windows(lrs, save_path, part)

    def test_video_truth(self, path: str, name: str = "result", part: int = 1000):
        """Degrade truth/*.png on device, then super-resolve."""
        import glob

        files = sorted(glob.glob(os.path.join(path, "truth", "*.png")))
        imgs = np.stack([imread(f) for f in files]).astype(np.float32) / 255.0
        lrs = self._degrade_video(imgs)
        return self._dispatch(lrs, os.path.join(path, name), part)

    def test_video_lr(self, path: str, name: str = "result", part: int = 1000):
        """Super-resolve pre-rendered blur{scale}/*.png."""
        import glob

        files = sorted(
            glob.glob(os.path.join(path, f"blur{self.cfg.scale}", "*.png"))
        )
        lrs = np.stack([imread(f) for f in files]).astype(np.float32) / 255.0
        return self._dispatch(lrs, os.path.join(path, name), part)

    # reference naming for the VESPCN family (model/vespcn.py:298)
    def testvideo(self, path: str, name: str = "result", part: int = 1000):
        return self.test_video_lr(path, name, part)

    def testvideos(self, path: str, start: int = 0, name: str = "result",
                   from_truth: Optional[bool] = None):
        """Iterate sequence subdirectories (model/pfnl.py:322-332).
        from_truth defaults to the family's reference behaviour: PFNL/DUF
        truth-degrade for PFNL, LR files for the others."""
        if from_truth is None:
            from_truth = self.cfg.model == "pfnl"
        for idx, k in enumerate(scan_dataset_dir(path)):
            if idx >= start:
                if from_truth:
                    self.test_video_truth(k, name=name)
                else:
                    self.test_video_lr(k, name=name)
