from lanetpu.train.losses import bce_dice_loss, bce_with_logits, dice_loss, focal_loss
from lanetpu.train.steps import TrainState, create_train_state, make_train_step, make_eval_step

__all__ = [
    "bce_dice_loss",
    "bce_with_logits",
    "dice_loss",
    "focal_loss",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
]
