from image_search_tpu.models.clip import (
    encode_image,
    encode_text,
    forward,
    init_params,
)
from image_search_tpu.models.convert import (
    load_checkpoint,
    params_from_hf_state_dict,
    save_checkpoint,
)

__all__ = [
    "encode_image",
    "encode_text",
    "forward",
    "init_params",
    "params_from_hf_state_dict",
    "save_checkpoint",
    "load_checkpoint",
]
