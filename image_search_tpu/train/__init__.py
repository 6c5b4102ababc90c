from image_search_tpu.train.contrastive import (
    TrainState,
    clip_loss,
    make_train_step,
    param_shardings,
)
from image_search_tpu.train.eval import evaluate_pairs

__all__ = [
    "TrainState",
    "clip_loss",
    "make_train_step",
    "param_shardings",
    "evaluate_pairs",
]
