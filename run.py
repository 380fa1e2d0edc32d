#!/usr/bin/env python
"""pfnl_tpu CLI — the reference's edit-main.py-by-hand workflow
(main.py:12-15) replaced by:

    python run.py train  <model> [--train-list ...] [--steps N] ...
    python run.py eval   <model> [--eval-list ...]
    python run.py test   <model> --data <dataset_dir> [--start N] [--name X]
    python run.py bench  [--model pfnl] [--hw 180x320] [--frames 7]

<model> in {pfnl, vespcn, mcresnet, ltdvsr, drvsr, frvsr, duf}.
"""

import argparse
import sys

import numpy as np


def _common(p):
    p.add_argument("model", choices=["pfnl", "vespcn", "mcresnet", "ltdvsr", "drvsr", "frvsr", "duf"])
    p.add_argument("--save-dir", default=None)
    p.add_argument("--scale", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--in-size", type=int, default=None)
    p.add_argument("--eval-in-size", default=None,
                   help="HxW of eval crops at LR, e.g. 128x240")
    p.add_argument("--compute-dtype", default=None,
                   choices=["float32", "bfloat16"],
                   help="activation/compute dtype (params stay float32); "
                        "bfloat16 = mixed-precision training/inference")
    p.add_argument("--matmul-precision", default=None,
                   choices=["default", "high", "highest"],
                   help="jax default matmul/conv precision; use 'highest' "
                        "for parity sweeps (some TPU environments lower "
                        "f32 convs to bf16 otherwise)")


def _apply_precision(args):
    if getattr(args, "matmul_precision", None):
        import jax

        jax.config.update("jax_default_matmul_precision", args.matmul_precision)


def _cfg_from_args(args, **extra):
    from pfnl_tpu.config import preset

    over = dict(extra)
    for k in ("save_dir", "scale", "batch_size", "in_size", "compute_dtype"):
        v = getattr(args, k, None)
        if v is not None:
            over[k] = v
    eis = getattr(args, "eval_in_size", None)
    if eis:
        h, w = eis.split("x")
        over["eval_in_size"] = (int(h), int(w))
    return preset(args.model, **over)


def cmd_train(args):
    # distributed bring-up must precede every other jax call (backend
    # init); no-op for single-process runs
    from pfnl_tpu.parallel import multihost

    multihost.initialize(coordinator_address=args.coordinator,
                         num_processes=args.num_processes,
                         process_id=args.process_id)
    _apply_precision(args)
    import jax
    from pfnl_tpu.data.manifest import load_manifest
    from pfnl_tpu.data.pipeline import TrainPipeline
    from pfnl_tpu.eval.evaluator import Evaluator
    from pfnl_tpu.train.trainer import Trainer

    over = {}
    if args.train_list:
        over["train_list"] = args.train_list
    if args.eval_list:
        over["eval_list"] = args.eval_list
    cfg = _cfg_from_args(args, **over)
    tr = Trainer(cfg)
    seqs = load_manifest(cfg.train_list, cfg.scale, need_blur=cfg.producer != "single")
    # multi-process: this host's pipeline renders only its local shard of
    # the global batch, with a process-distinct sampling stream (SURVEY
    # §5.8 host-local loading)
    local_bs = multihost.local_batch_size(cfg.batch_size)
    pipe = TrainPipeline(
        seqs, cfg.producer, cfg.num_frames, cfg.in_size, cfg.scale,
        local_bs, seed=cfg.seed + 7919 * jax.process_index(),
        num_threads=cfg.host_threads,
        prefetch=cfg.prefetch,
    )
    eval_fn = None
    if not args.no_eval:
        ev = Evaluator(cfg, tr.model)
        multi = jax.process_count() > 1

        def eval_fn(state, step):
            variables = {"params": state.params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            if multi:
                # the state lives on a mesh spanning non-addressable
                # devices; the evaluator's jit runs single-controller on
                # THIS process — hand it host copies (params are fully
                # replicated, so device_get is complete per-process)
                variables = jax.device_get(variables)
            ev.run(variables, step, log_path=cfg.log_path)

    mesh = None
    if args.dp > 1 or args.sp > 1 or jax.process_count() > 1:
        mesh = multihost.make_dp_mesh(
            n_data=args.dp if args.dp > 1 else None, n_space=args.sp)
        n_data = mesh.shape["data"]
        if cfg.batch_size % n_data:
            raise SystemExit(
                f"batch {cfg.batch_size} not divisible by dp={n_data}")
    tr.fit(pipe, max_steps=args.steps, eval_fn=eval_fn,
           save_every=args.save_every, mesh=mesh)
    pipe.close()


def cmd_eval(args):
    _apply_precision(args)
    from pfnl_tpu.eval.evaluator import Evaluator
    from pfnl_tpu.train.trainer import Trainer

    over = {}
    if args.eval_list:
        over["eval_list"] = args.eval_list
    cfg = _cfg_from_args(args, **over)
    tr = Trainer(cfg)
    state = _restored_state(tr, cfg)
    variables = {"params": state.params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats
    Evaluator(cfg, tr.model).run(variables, int(state.step), log_path=cfg.log_path)


def _restored_state(tr, cfg):
    import jax
    import jax.numpy as jnp

    shape = (1, cfg.num_frames, cfg.in_size, cfg.in_size, 3)
    state = tr.init_state(jax.random.PRNGKey(0), np.zeros(shape, np.float32))
    return tr.restore(state)


def cmd_test(args):
    _apply_precision(args)
    from pfnl_tpu.infer.predictor import Predictor
    from pfnl_tpu.train.trainer import Trainer

    cfg = _cfg_from_args(args)
    tr = Trainer(cfg)
    state = _restored_state(tr, cfg)
    variables = {"params": state.params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats
    mesh = None
    if getattr(args, "dp", 1) > 1:
        from pfnl_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_data=args.dp, n_space=1)
    pred = Predictor(cfg, tr.model, variables, mesh=mesh)
    pred.testvideos(args.data, start=args.start, name=args.name or cfg.model)


def cmd_export(args):
    _apply_precision(args)
    import jax.numpy as jnp

    from pfnl_tpu.infer.export import export_model
    from pfnl_tpu.train.trainer import Trainer

    cfg = _cfg_from_args(args)
    tr = Trainer(cfg)
    state = _restored_state(tr, cfg)
    variables = {"params": state.params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats
    h, w = (int(v) for v in args.hw.split("x"))
    blob = export_model(
        tr.model, variables, args.batch, cfg.num_frames, (h, w),
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        model_name=cfg.model,
    )
    out = args.out or f"{cfg.model}_{h}x{w}_b{args.batch}.shlo"
    with open(out, "wb") as f:
        f.write(blob)
    print(f"exported {cfg.model} [{args.batch},{cfg.num_frames},{h},{w},3] "
          f"-> {out} ({len(blob)/1e6:.1f} MB)")


def cmd_bench(args):
    import bench

    bench.main(model=args.model, hw=args.hw, frames=args.frames, steps=args.steps)


def cmd_prepare(args):
    from pfnl_tpu.data.prepare import make_filelists, prepare_dataset

    n = prepare_dataset(args.root, scale=args.scale, overwrite=args.overwrite)
    print(f"rendered {n} LR frames")
    if not args.no_filelists:
        make_filelists(args.root, val_count=args.val_count)


def cmd_parity(args):
    """One-command parity sweep: run inference over a dataset dir of
    truth-only sequences, then print the MATLAB-equivalent Y-channel
    PSNR/SSIM table (the README table layout)."""
    _apply_precision(args)
    from pfnl_tpu.eval.tables import dataset_table

    name = args.name or f"{args.model}_parity"
    if not args.tables_only:
        cmd_test(_ns(args, name=name, start=0))
    return dataset_table(args.data, name)


class _ns:
    """argparse-namespace view with overrides."""

    def __init__(self, base, **kw):
        self.__dict__.update(vars(base))
        self.__dict__.update(kw)


def cmd_import_tf1(args):
    """Convert a reference TF1 checkpoint into an orbax checkpoint that
    eval/test/parity can restore (no TensorFlow required)."""
    import jax
    import jax.numpy as jnp

    from pfnl_tpu.train.trainer import Trainer
    from pfnl_tpu.utils.tf1_imports import IMPORTERS, import_duf_hdf5

    cfg = _cfg_from_args(args)
    if cfg.model not in IMPORTERS:
        raise SystemExit(f"no TF1 importer for model {cfg.model!r}")
    importer, cfg_keys, has_stats = IMPORTERS[cfg.model]
    tr = Trainer(cfg)
    shape = (1, cfg.num_frames, cfg.in_size, cfg.in_size, 3)
    state = tr.init_state(jax.random.PRNGKey(0), np.zeros(shape, np.float32))

    if args.ckpt.endswith((".h5", ".hdf5")):
        # original VSR-DUF weights path (reference utils.py:290-318)
        if cfg.model != "duf":
            raise SystemExit("hdf5 import is only defined for duf")
        imported, stats = import_duf_hdf5(
            state.params, state.batch_stats, args.ckpt)
    else:
        kwargs = {k: getattr(cfg, k) for k in cfg_keys}
        out = importer(args.ckpt, **kwargs)
        imported, stats = out if has_stats else (out, state.batch_stats)
        imported = jax.tree.map(jnp.asarray, imported)
        stats = jax.tree.map(jnp.asarray, stats)
        ref_shapes = jax.tree.map(lambda a: a.shape, state.params)
        new_shapes = jax.tree.map(lambda a: a.shape, imported)
        if ref_shapes != new_shapes:
            raise SystemExit(
                f"imported param tree mismatch:\n{ref_shapes}\nvs\n{new_shapes}")
        if has_stats:
            ref_ss = jax.tree.map(lambda a: a.shape, state.batch_stats)
            new_ss = jax.tree.map(lambda a: a.shape, stats)
            if ref_ss != new_ss:
                raise SystemExit(
                    f"imported batch_stats tree mismatch:\n{ref_ss}\nvs\n{new_ss}")
    tr.save(state.replace(params=imported, batch_stats=stats))
    print(f"imported {args.ckpt} -> {tr.workdir} (step {int(state.step)})")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="run.py")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("train")
    _common(p)
    p.add_argument("--train-list", default=None)
    p.add_argument("--eval-list", default=None)
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--no-eval", action="store_true")
    p.add_argument("--save-every", type=int, default=500)
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel mesh size (batch axis)")
    p.add_argument("--sp", type=int, default=1,
                   help="spatial mesh size (non-local context parallelism)")
    p.add_argument("--coordinator", default=None,
                   help="jax.distributed coordinator address "
                        "(host:port) for multi-host/multi-slice runs")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("eval")
    _common(p)
    p.add_argument("--eval-list", default=None)
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("test")
    _common(p)
    p.add_argument("--data", required=True)
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--name", default=None)
    p.add_argument("--dp", type=int, default=1,
                   help="shard window batches over N chips (shard_map DP; "
                        "keeps per-chip Pallas kernels)")
    p.set_defaults(fn=cmd_test)

    p = sub.add_parser("bench")
    p.add_argument("--model", default="pfnl")
    p.add_argument("--hw", default="180x320")
    p.add_argument("--frames", type=int, default=7)
    p.add_argument("--steps", type=int, default=20)
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("prepare", help="render blur{scale}/ + filelists")
    p.add_argument("--root", required=True)
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--val-count", type=int, default=19)
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--no-filelists", action="store_true")
    p.set_defaults(fn=cmd_prepare)

    p = sub.add_parser("import-tf1",
                       help="convert a reference TF1 checkpoint to orbax")
    _common(p)
    p.add_argument("--ckpt", required=True,
                   help="TF1 checkpoint prefix (with .index/.data-* files)")
    p.set_defaults(fn=cmd_import_tf1)

    p = sub.add_parser("export",
                       help="AOT-export the model to a StableHLO artifact")
    _common(p)
    p.add_argument("--hw", default="180x320", help="LR input HxW")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--out", default=None)
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser("parity", help="inference + Y-PSNR/SSIM table")
    _common(p)
    p.add_argument("--data", required=True)
    p.add_argument("--name", default=None)
    p.add_argument("--tables-only", action="store_true",
                   help="skip inference, just recompute the table")
    p.set_defaults(fn=cmd_parity)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
