from image_search_tpu.train.contrastive import (
    TrainState,
    clip_loss,
    make_train_step,
    param_shardings,
)

__all__ = ["TrainState", "clip_loss", "make_train_step", "param_shardings"]
