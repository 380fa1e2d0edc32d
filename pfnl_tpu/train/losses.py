"""Per-model loss graphs, replicating the reference's numerics exactly.

Every loss function takes (out: dict from the model, gt: [B,Tg,H,W,3] float
RGB, lr: [B,T,h,w,3]) and returns a dict with:
  "loss"     the joint objective (stage 1 / only stage)
  "loss_sr"  the SR-only objective (stage 0 of staged training)
plus named components for logging.
"""

import numpy as np
import jax.numpy as jnp

from pfnl_tpu.ops.color import rgb2y
from pfnl_tpu.ops.losses import charbonnier, huber, total_variation
from pfnl_tpu.ops.warp import backward_warp_local


def _flow_loss(out, lr_shape):
    """Photometric L1 of each frame vs the backward-warped reference frame
    + 0.01*TV of the flow (model/vespcn.py:121-127)."""
    # widen to f32 here: under mixed precision the models emit bf16
    # uv/frames_y/ref_y, and the photometric/TV reductions must not
    # accumulate at ~3 significant digits
    uv = out["uv"].astype(jnp.float32)  # [B,T,h,w,2]
    frames_y = out["frames_y"].astype(jnp.float32)
    b, t, h, w, _ = uv.shape
    ref_rep = jnp.broadcast_to(
        out["ref_y"].astype(jnp.float32)[:, None], frames_y.shape)
    # every in-model flow is tanh-bounded (EasyFlow two-stage sum <= 2,
    # LTD/FRVSR <= 1): gather-free local warp
    warped = backward_warp_local(ref_rep, uv, max_disp=2)
    loss_data = jnp.mean(jnp.abs(frames_y - warped))
    uv4 = uv.reshape(b * t, h, w, 2)
    loss_tv = total_variation(uv4) / float(np.prod(uv4.shape))
    return loss_data + 0.01 * loss_tv, loss_data, loss_tv


def pfnl_loss(out, gt, lr):
    """Charbonnier (model/pfnl.py:89)."""
    loss = charbonnier(out["sr"], gt)
    return {"loss": loss, "loss_sr": loss}


def vespcn_like_loss(out, gt, lr):
    """Charbonnier on Y + 0.01*flow loss (model/vespcn.py:108-130;
    identical for MCResNet/LTDVSR)."""
    gt_y = rgb2y(gt)
    loss_mse = charbonnier(out["sr"], gt_y)
    loss_flow, flow_data, flow_tv = _flow_loss(out, lr.shape)
    return {
        "loss": loss_mse + 0.01 * loss_flow,
        "loss_sr": loss_mse,
        "loss_mse": loss_mse,
        "loss_flow": loss_flow,
    }


def drvsr_loss(out, gt, lr):
    """Per-output-frame MSE weighted by normalized linspace(0.5,1.0)
    (model/drvsr.py:38-39,196-222) + 0.01*flow loss."""
    gt_y = rgb2y(gt)  # [B,1,H,W,1] broadcasts over T
    t = out["sr"].shape[1]
    wts = np.linspace(0.5, 1.0, t)
    wts = jnp.asarray(wts / wts.sum(), jnp.float32)
    mse_t = jnp.mean((out["sr"] - gt_y) ** 2, axis=(0, 2, 3, 4))
    loss_mse = jnp.sum(mse_t * wts)
    loss_flow, flow_data, flow_tv = _flow_loss(out, lr.shape)
    return {
        "loss": loss_mse + 0.01 * loss_flow,
        "loss_sr": loss_mse,
        "loss_mse": loss_mse,
        "loss_flow": loss_flow,
    }


def frvsr_loss(out, gt, lr):
    """SR MSE over all frames + flow-warp MSE (model/frvsr.py:142-147)."""
    sr_loss = jnp.mean((out["sr"] - gt) ** 2)
    flow_loss = jnp.mean((out["warps"] - lr[:, 1:]) ** 2)
    loss = sr_loss + flow_loss
    return {"loss": loss, "loss_sr": sr_loss, "flow_loss": flow_loss}


def duf_loss(out, gt, lr):
    """delta-Huber, delta=0.01 (model/dufvsr.py:65)."""
    loss = huber(gt, out["sr"], 0.01)
    return {"loss": loss, "loss_sr": loss}


LOSS_REGISTRY = {
    "pfnl": pfnl_loss,
    "vespcn": vespcn_like_loss,
    "mcresnet": vespcn_like_loss,
    "ltdvsr": vespcn_like_loss,
    "drvsr": drvsr_loss,
    "frvsr": frvsr_loss,
    "duf": duf_loss,
}
