from pfnl_tpu.data.manifest import Sequence, load_manifest
from pfnl_tpu.data.pipeline import TrainPipeline, device_augment_and_degrade

__all__ = ["Sequence", "load_manifest", "TrainPipeline", "device_augment_and_degrade"]
