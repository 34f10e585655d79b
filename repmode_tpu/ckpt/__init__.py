from repmode_tpu.ckpt.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    restore_train_state,
    CheckpointPolicy,
)

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "restore_train_state",
    "CheckpointPolicy",
]
