"""Unified trainer for all model families.

Replicates the reference training semantics (SURVEY.md §3.1, §5.6):
  * Adam (beta1=0.9, beta2=0.999, eps=1e-8) with polynomial lr decay
    driven by the *global* step (tf.train.polynomial_decay,
    model/pfnl.py:156);
  * staged optimization for the flow models: SR-only loss/vars before
    `stage_switch_step`, joint after — with a FRESH Adam second-moment
    state at the switch, exactly like the reference's two coexisting
    AdamOptimizer instances (model/vespcn.py:227-229,253-257);
  * LSTM-only clip_by_global_norm(3) for DRVSR (model/drvsr.py:313-326);
  * NaN assert + loss>10 collapse break (model/pfnl.py:197-199);
  * save + eval every 500 steps, loss print every 20 (model/pfnl.py:180-192);
  * orbax checkpoints (step-in-state -> exact resume, reference
    `reload=True` semantics).

TPU-first: the whole step — uint8 host batch in, augmentation, on-device
degradation, fwd/bwd, Adam update — is ONE jitted function with donated
state; there is no per-step host round trip of the batch.
"""

import os
import time
from typing import Any, Callable, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import struct
import orbax.checkpoint as ocp

from pfnl_tpu.config import Config
from pfnl_tpu.data.pipeline import TrainPipeline, device_augment_and_degrade
from pfnl_tpu.models import MODEL_REGISTRY
from pfnl_tpu.train.losses import LOSS_REGISTRY


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_states: Any  # tuple: one per stage


def _label_params(params, flow_keys=("easyflow", "flow", "flownet")):
    """'flow' vs 'sr' label for every leaf, split by top-level collection
    (the reference splits vars by scope name, model/vespcn.py:225-226)."""
    return {
        k: jax.tree.map(lambda _: "flow" if k in flow_keys else "sr", v)
        for k, v in params.items()
    }


def _lstm_mask(params):
    def mask(tree, inside):
        if isinstance(tree, dict):
            return {k: mask(v, inside or "lstm" in k.lower()) for k, v in tree.items()}
        return inside

    return mask(params, False)


def build_model(cfg: Config):
    cls = MODEL_REGISTRY[cfg.model]
    kwargs = {}
    if cfg.model in ("pfnl", "vespcn", "mcresnet", "ltdvsr", "frvsr", "drvsr", "duf"):
        kwargs["num_frames"] = cfg.num_frames
        kwargs["scale"] = cfg.scale
        if cfg.compute_dtype == "bfloat16":
            # mixed precision: bf16 activations/compute, f32 params and
            # optimizer state (flax param_dtype default), f32 loss-facing
            # outputs (models cast "sr" etc. back up)
            kwargs["dtype"] = jnp.bfloat16
    return cls(**kwargs)


class Trainer:
    def __init__(self, cfg: Config, workdir: Optional[str] = None, model=None):
        self.cfg = cfg
        self.model = model if model is not None else build_model(cfg)
        self.loss_fn = LOSS_REGISTRY[cfg.model]
        self.workdir = workdir or cfg.save_dir
        self.has_bn = cfg.model == "duf"
        self.schedule = optax.polynomial_schedule(
            init_value=cfg.learning_rate,
            end_value=cfg.end_lr,
            power=cfg.decay_power,
            transition_steps=int(cfg.decay_step),
        )
        self.staged = cfg.stage_switch_step is not None
        self._build_optimizers()
        self._ckpt_mgr = None
        self._step_fns: Dict[int, Callable] = {}

    # --- optimizers -----------------------------------------------------
    def _base_tx(self):
        """Adam sans lr (applied manually from the global step)."""
        tx = optax.chain(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8), optax.scale(-1.0))
        if self.cfg.model == "drvsr":
            # LSTM grads clipped by their own global norm before Adam
            tx = optax.chain(
                optax.masked(optax.clip_by_global_norm(3.0), self._lstm_mask_fn), tx
            )
        return tx

    def _lstm_mask_fn(self, params):
        return _lstm_mask(params)

    def _build_optimizers(self):
        if self.staged:
            tx_sr = optax.multi_transform(
                {"sr": self._base_tx(), "flow": optax.set_to_zero()}, _label_params
            )
            tx_all = self._base_tx()
            self.txs = (tx_sr, tx_all)
        else:
            self.txs = (self._base_tx(),)

    # --- state ----------------------------------------------------------
    def init_state(self, rng_key, sample_lr: np.ndarray) -> TrainState:
        x = jnp.asarray(sample_lr)
        if self.has_bn:
            variables = self.model.init(rng_key, x, is_train=True)
        else:
            variables = self.model.init(rng_key, x)
        params = variables["params"]
        batch_stats = variables.get("batch_stats")
        # param-count printout (reference utils.py:87-92, vespcn.py:231-233)
        from pfnl_tpu.utils.param_io import get_num_params

        flow_keys = ("easyflow", "flow", "flownet")
        n_flow = sum(
            get_num_params(v) for k, v in params.items() if k in flow_keys
        )
        n_all = get_num_params(params)
        if n_flow:
            print(f"params num of flow: {n_flow}")
            print(f"params num of sr: {n_all - n_flow}")
        print(f"Params num of all: {n_all}")
        opt_states = tuple(tx.init(params) for tx in self.txs)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_states=opt_states,
        )

    def _apply(self, params, batch_stats, x, train: bool):
        variables = {"params": params}
        if self.has_bn:
            variables["batch_stats"] = batch_stats
            if train:
                out, mut = self.model.apply(
                    variables, x, is_train=True, mutable=["batch_stats"]
                )
                return out, mut["batch_stats"]
            return self.model.apply(variables, x, is_train=False), batch_stats
        return self.model.apply(variables, x), batch_stats

    # --- train step -----------------------------------------------------
    def _make_step(self, stage: int):
        mode = self.cfg.producer
        scale = self.cfg.scale
        use_joint = not self.staged or stage == 1
        loss_key = "loss" if use_joint else "loss_sr"

        def step_fn(state: TrainState, batch, key):
            lr_in, gt = device_augment_and_degrade(batch, key, mode, scale)

            def loss_of(params):
                out, new_bs = self._apply(params, state.batch_stats, lr_in, train=True)
                losses = self.loss_fn(out, gt, lr_in)
                return losses[loss_key], (losses, new_bs)

            grads, (losses, new_bs) = jax.grad(loss_of, has_aux=True)(state.params)
            lr_now = self.schedule(state.step)
            tx = self.txs[stage]
            opt_state = state.opt_states[stage]
            updates, new_opt = tx.update(grads, opt_state, state.params)
            updates = jax.tree.map(lambda u: u * lr_now, updates)
            params = optax.apply_updates(state.params, updates)
            opt_states = tuple(
                new_opt if i == stage else s for i, s in enumerate(state.opt_states)
            )
            new_state = state.replace(
                step=state.step + 1,
                params=params,
                batch_stats=new_bs,
                opt_states=opt_states,
            )
            return new_state, losses

        return jax.jit(step_fn, donate_argnums=(0,))

    def step_fn(self, stage: int):
        if stage not in self._step_fns:
            self._step_fns[stage] = self._make_step(stage)
        return self._step_fns[stage]

    def traced_step_fn(self, stage: int):
        """The un-jitted step function — for embedding in outer jitted
        loops (e.g. lax.scan over many steps)."""
        return self.step_fn(stage).__wrapped__

    # --- checkpointing --------------------------------------------------
    @property
    def ckpt_mgr(self):
        if self._ckpt_mgr is None:
            options = ocp.CheckpointManagerOptions(max_to_keep=5, create=True)
            self._ckpt_mgr = ocp.CheckpointManager(
                os.path.abspath(self.workdir), options=options
            )
        return self._ckpt_mgr

    def save(self, state: TrainState):
        step = int(state.step)
        self.ckpt_mgr.save(step, args=ocp.args.StandardSave(jax.device_get(state)))
        self.ckpt_mgr.wait_until_finished()

    def restore(self, state: TrainState) -> TrainState:
        """Restore latest checkpoint if present (reference reload=True)."""
        latest = self.ckpt_mgr.latest_step()
        if latest is None:
            return state
        template = jax.device_get(state)
        try:
            restored = self.ckpt_mgr.restore(
                latest, args=ocp.args.StandardRestore(template)
            )
        except (ValueError, KeyError):
            if not self.has_bn:
                raise
            restored = self._restore_legacy_bn(latest, template)
        return jax.tree.map(jnp.asarray, restored)

    def _restore_legacy_bn(self, latest: int, template):
        """DUF checkpoints written before the zero_debias shadow stats
        (biased_mean/biased_var/local_step) lack those leaves; restore
        against a shadow-free template and seed the shadows like the
        TF1 importer (checkpoint is past BN warm-up)."""
        _SHADOW = ("biased_mean", "biased_var", "local_step")

        def strip(tree):
            if not isinstance(tree, dict):
                return tree
            return {k: strip(v) for k, v in tree.items() if k not in _SHADOW}

        def seed(tree):
            if not isinstance(tree, dict):
                return tree
            if "moving_mean" in tree:
                return dict(tree,
                            biased_mean=tree["moving_mean"],
                            biased_var=tree["moving_variance"],
                            local_step=np.asarray(1e7, np.float32))
            return {k: seed(v) for k, v in tree.items()}

        legacy = template.replace(batch_stats=strip(template.batch_stats))
        restored = self.ckpt_mgr.restore(
            latest, args=ocp.args.StandardRestore(legacy))
        return restored.replace(batch_stats=seed(restored.batch_stats))

    # --- loop -----------------------------------------------------------
    def fit(
        self,
        pipeline: TrainPipeline,
        state: Optional[TrainState] = None,
        max_steps: Optional[int] = None,
        eval_fn: Optional[Callable[[TrainState, int], None]] = None,
        save_every: int = 500,
        log_every: int = 20,
        print_fn=print,
        mesh=None,
    ) -> TrainState:
        """`mesh`: a jax.sharding.Mesh for multi-chip training — params
        replicated, batch sharded over the 'data' axis; XLA inserts the
        gradient all-reduce from the shardings (SURVEY.md §5.8).  When
        the mesh spans processes (multi-host/multi-slice), `pipeline`
        must produce the PER-PROCESS batch (global/process_count) with a
        process-distinct seed; each process feeds only its local shard
        (jax.make_array_from_process_local_data) and checkpoints/eval/
        logging run on process 0 only."""
        cfg = self.cfg
        main = jax.process_index() == 0
        if not main:
            eval_fn = None
            print_fn = lambda *a, **k: None  # noqa: E731
        if state is None:
            batch0 = pipeline.get_batch()
            lr0, _ = device_augment_and_degrade(
                jax.tree.map(jnp.asarray, batch0), jax.random.PRNGKey(0), cfg.producer, cfg.scale
            )
            state = self.init_state(jax.random.PRNGKey(cfg.seed), np.asarray(lr0))
            if cfg.reload:
                state = self.restore(state)
        if mesh is not None:
            from pfnl_tpu.parallel import multihost

            # multi-process resume: only process 0 saves checkpoints, so
            # after restore the other processes hold divergent init state
            # (and step counts) — replicate process 0's copy everywhere
            state = multihost.replicate(
                multihost.broadcast_from_main(jax.device_get(state)), mesh)
        max_steps = max_steps or cfg.max_step
        base_key = jax.random.PRNGKey(cfg.seed + 1)
        start = int(state.step)
        t0 = time.time()
        last_losses = None

        def check(step) -> bool:
            """Blocking divergence check on the most recent loss.  Runs at
            log_every cadence, not per step: a per-step float() readback
            costs one host RTT per step (~30 ms on a relay), and NaN
            propagates through Adam into the params so the NEXT checked
            loss is NaN too — nothing is missed by checking lazily.
            Reference semantics (model/pfnl.py:195-199) preserved at the
            check points."""
            if last_losses is None:
                return True
            loss_v = float(last_losses["loss"])
            assert not np.isnan(loss_v), "Model diverged with loss = NaN"
            if step > 500 and loss_v > 10:
                print_fn(f"Model collapsed with loss={loss_v}")
                return False
            return True

        collapsed = False
        for step in range(start, max_steps):
            stage = 0
            if self.staged and cfg.stage_switch_step is not None and step >= cfg.stage_switch_step:
                stage = 1
            if step > start and step % log_every == 0:
                if not check(step):
                    collapsed = True
                    break
                print_fn(
                    f"{time.strftime('%Y-%m-%d %H:%M:%S')} Step:{step},"
                    f" loss:{float(last_losses['loss'])}"
                )
            if step % save_every == 0:
                if step > start and main:
                    self.save(state)
                if eval_fn is not None:
                    eval_fn(state, step)
                print_fn(f"cost {time.time() - t0}s.")
                t0 = time.time()
            batch = pipeline.get_batch()
            if mesh is not None:
                batch = multihost.host_local_batch(batch, mesh)
            key = jax.random.fold_in(base_key, step)
            state, last_losses = self.step_fn(stage)(state, batch, key)
        if not collapsed:
            check(max_steps)
        return state
