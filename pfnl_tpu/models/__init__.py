"""Model families (L3).  One flax.linen module per paper, all consuming
[N,T,h,w,C] clips in [0,1] and producing [N,T_out,H,W,C] super-resolved
frames, mirroring the reference's `forward()` contracts (SURVEY.md §1 L3).
"""

from pfnl_tpu.models.pfnl import PFNL
from pfnl_tpu.models.vespcn import VESPCN
from pfnl_tpu.models.mcresnet import MCResNet
from pfnl_tpu.models.ltdvsr import LTDVSR
from pfnl_tpu.models.frvsr import FRVSR
from pfnl_tpu.models.drvsr import DRVSR
from pfnl_tpu.models.duf import DUF

MODEL_REGISTRY = {
    "pfnl": PFNL,
    "vespcn": VESPCN,
    "mcresnet": MCResNet,
    "ltdvsr": LTDVSR,
    "frvsr": FRVSR,
    "drvsr": DRVSR,
    "duf": DUF,
}

__all__ = ["PFNL", "VESPCN", "MCResNet", "LTDVSR", "FRVSR", "DRVSR", "DUF", "MODEL_REGISTRY"]
