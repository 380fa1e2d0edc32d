from pfnl_tpu.train.trainer import Trainer, TrainState
from pfnl_tpu.train.losses import LOSS_REGISTRY

__all__ = ["Trainer", "TrainState", "LOSS_REGISTRY"]
