"""Training layer (L4/L5 of SURVEY.md §1): losses, state, jitted steps,
checkpointing."""

from . import losses
from .state import TrainState, init_state, make_optimizer, halving_schedule
from .loops import (
    make_steps,
    make_classify_steps,
    make_segment_steps,
    make_autoencode_steps,
    random_point_dropout,
)
from .checkpoints import (
    save_checkpoint,
    restore_checkpoint,
    restore_encoder,
    latest_checkpoint,
)
from .trainer import Trainer, build_dataset

__all__ = [
    "losses", "TrainState", "init_state", "make_optimizer",
    "halving_schedule", "make_steps", "make_classify_steps",
    "make_segment_steps", "make_autoencode_steps", "random_point_dropout",
    "save_checkpoint", "restore_checkpoint", "restore_encoder",
    "latest_checkpoint", "Trainer", "build_dataset",
]
