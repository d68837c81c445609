from eigenpinns_tpu.train.optim import (
    adam_plateau,
    adamw_cosine_restarts,
    adam_exp_decay,
)
from eigenpinns_tpu.train.loop import run_scan_loop, LoopResult
from eigenpinns_tpu.train.checkpoint import (
    save_checkpoint,
    restore_checkpoint,
    latest_checkpoint,
    TrainCheckpointer,
)

__all__ = [
    "adam_plateau", "adamw_cosine_restarts", "adam_exp_decay",
    "run_scan_loop", "LoopResult",
    "save_checkpoint", "restore_checkpoint", "latest_checkpoint",
    "TrainCheckpointer",
]
