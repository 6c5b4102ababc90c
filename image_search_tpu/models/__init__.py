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


def get_model_module(cfg):
    """Arch dispatch: the model family behind one interface (config.arch)."""
    if cfg.arch == "clip":
        from image_search_tpu.models import clip as mod
    elif cfg.arch == "siglip":
        from image_search_tpu.models import siglip as mod
    else:
        raise ValueError(f"unknown model arch {cfg.arch!r}")
    return mod


__all__ = [
    "encode_image",
    "encode_text",
    "forward",
    "init_params",
    "get_model_module",
    "params_from_hf_state_dict",
    "save_checkpoint",
    "load_checkpoint",
]
