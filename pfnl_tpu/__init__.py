"""pfnl_tpu — a TPU-native video super-resolution framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of the PFNL
reference implementation (psychopa4/PFNL, ICCV 2019): seven video-SR model
families (VESPCN, RVSR-LTD, MCResNet, DRVSR, FRVSR, DUF, PFNL), the shared
degradation/data pipeline, training with periodic evaluation, and the
`testvideo()`/`testvideos()` inference API — redesigned TPU-first:

  * all compute paths are jittable, static-shaped, and MXU-friendly,
  * the degradation + augmentation pipeline runs on-device inside the train
    step (the reference round-trips batches through host numpy each step),
  * the quadratic non-local attention block has a streaming (flash-style)
    Pallas kernel, removing the O(N^2) memory of the reference,
  * recurrences (FRVSR/DRVSR ConvLSTM) compile through `lax.scan`,
  * multi-chip scaling is expressed with `jax.sharding.Mesh` + NamedSharding
    (data parallel) and `shard_map` (spatially-sharded attention).

Layer map (mirrors SURVEY.md §1 of the reference):
  ops/       L0 tensor ops (degrade, color, resize, shuffle, warp, nonlocal,
             dynfilter, convlstm, losses) + Pallas kernels
  models/    L3 model families as flax.linen modules + flow subnets (L1)
  data/      L2 manifest-driven pipeline, host PNG IO + device degradation
  train/     trainer (optax, staged optimizers, guards, orbax checkpoints)
  eval/      periodic validation + MATLAB-equivalent metrics
  infer/     testvideo()/testvideos()-compatible chunked inference
  parallel/  mesh construction, sharding rules, spatial-parallel attention
  utils/     image IO, logging, misc
"""

__version__ = "0.1.0"
