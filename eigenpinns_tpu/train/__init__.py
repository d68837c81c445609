from eigenpinns_tpu.train.optim import (
    adam_plateau,
    adamw_cosine_restarts,
    adam_exp_decay,
)
from eigenpinns_tpu.train.loop import run_scan_loop, LoopResult

__all__ = [
    "adam_plateau", "adamw_cosine_restarts", "adam_exp_decay",
    "run_scan_loop", "LoopResult",
]
