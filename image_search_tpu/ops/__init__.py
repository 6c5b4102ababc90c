from image_search_tpu.ops.preprocess import (
    CLIP_MEAN,
    CLIP_STD,
    IMAGENET_MEAN,
    IMAGENET_STD,
    fused_preprocess,
    preprocess_matrices,
    resize_matrix,
)

__all__ = [
    "CLIP_MEAN",
    "CLIP_STD",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "fused_preprocess",
    "preprocess_matrices",
    "resize_matrix",
]
