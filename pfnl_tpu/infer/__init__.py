from pfnl_tpu.infer.predictor import Predictor

__all__ = ["Predictor"]
