"""Checkpoint conversion and persistence.

The reference has a split-brain weight pipeline: the vision tower is
ONNX-codegen'd into Rust + a ``vision_model.mpk`` artifact
(``/root/reference/clip/build.rs:75-83``) while the text tower is a separate
HF download inside embed_anything (``server/src/clip.rs:35-40``). Here ONE
checkpoint (safetensors + embedded config) carries both towers.

Sources supported:
- a HuggingFace ``transformers.CLIPModel`` state_dict (torch tensors or
  numpy arrays) -> our pytree (``params_from_hf_state_dict``);
- a HF model directory holding ``model.safetensors`` + ``config.json``
  (``params_from_hf_dir``) — works fully offline;
- our own checkpoint files (``save_checkpoint`` / ``load_checkpoint``).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from image_search_tpu.config import CLIPConfig, get_config

Params = Dict[str, Any]


def _np(t) -> np.ndarray:
    """torch.Tensor | np.ndarray -> float32 numpy (no torch import needed)."""
    if isinstance(t, np.ndarray):
        return np.asarray(t, np.float32)
    # torch tensor (avoid importing torch unless the caller passed one)
    return np.asarray(t.detach().cpu().to_dense().float().numpy(), np.float32)


def _stack_tower_blocks(sd: Mapping[str, Any], prefix: str, num_layers: int) -> Params:
    """Stack HF per-layer weights into [L, ...] arrays for lax.scan."""

    def lin(name):
        # torch Linear stores [out, in]; we use x @ W with W [in, out].
        w = np.stack([_np(sd[f"{prefix}.layers.{i}.{name}.weight"]).T for i in range(num_layers)])
        b = np.stack([_np(sd[f"{prefix}.layers.{i}.{name}.bias"]) for i in range(num_layers)])
        return w, b

    def ln(name):
        s = np.stack([_np(sd[f"{prefix}.layers.{i}.{name}.weight"]) for i in range(num_layers)])
        b = np.stack([_np(sd[f"{prefix}.layers.{i}.{name}.bias"]) for i in range(num_layers)])
        return s, b

    q_w, q_b = lin("self_attn.q_proj")
    k_w, k_b = lin("self_attn.k_proj")
    v_w, v_b = lin("self_attn.v_proj")
    o_w, o_b = lin("self_attn.out_proj")
    fc_w, fc_b = lin("mlp.fc1")
    pj_w, pj_b = lin("mlp.fc2")
    ln1_s, ln1_b = ln("layer_norm1")
    ln2_s, ln2_b = ln("layer_norm2")
    return {
        "ln1_scale": ln1_s, "ln1_bias": ln1_b,
        # q/k/v fused into one [L, D, 3D] matmul: one MXU pass and the
        # enabler for the VMEM-resident fused attention kernel
        "qkv_w": np.concatenate([q_w, k_w, v_w], axis=2),
        "qkv_b": np.concatenate([q_b, k_b, v_b], axis=1),
        "o_w": o_w, "o_b": o_b,
        "ln2_scale": ln2_s, "ln2_bias": ln2_b,
        "fc_w": fc_w, "fc_b": fc_b,
        "proj_w": pj_w, "proj_b": pj_b,
    }


def params_from_hf_state_dict(
    sd: Mapping[str, Any], cfg: CLIPConfig, dtype=jnp.float32
) -> Params:
    """HF ``CLIPModel`` state_dict -> our parameter pytree."""
    tc, vc = cfg.text, cfg.vision

    text = {
        "token_embedding": _np(sd["text_model.embeddings.token_embedding.weight"]),
        "position_embedding": _np(sd["text_model.embeddings.position_embedding.weight"]),
        "blocks": _stack_tower_blocks(sd, "text_model.encoder", tc.num_layers),
        "final_ln_scale": _np(sd["text_model.final_layer_norm.weight"]),
        "final_ln_bias": _np(sd["text_model.final_layer_norm.bias"]),
        "projection": _np(sd["text_projection.weight"]).T,
    }

    # Conv weight [D, C, p, p] -> [p*p*C, D] with (ph, pw, c) minor order,
    # matching models.clip.patchify.
    conv = _np(sd["vision_model.embeddings.patch_embedding.weight"])
    D = conv.shape[0]
    patch_w = conv.transpose(2, 3, 1, 0).reshape(-1, D)

    vision = {
        "patch_embedding": patch_w,
        "class_embedding": _np(sd["vision_model.embeddings.class_embedding"]).reshape(-1),
        "position_embedding": _np(sd["vision_model.embeddings.position_embedding.weight"]),
        # sic: HF spells it "pre_layrnorm"
        "pre_ln_scale": _np(sd["vision_model.pre_layrnorm.weight"]),
        "pre_ln_bias": _np(sd["vision_model.pre_layrnorm.bias"]),
        "blocks": _stack_tower_blocks(sd, "vision_model.encoder", vc.num_layers),
        "post_ln_scale": _np(sd["vision_model.post_layernorm.weight"]),
        "post_ln_bias": _np(sd["vision_model.post_layernorm.bias"]),
        "projection": _np(sd["visual_projection.weight"]).T,
    }

    params = {
        "text": text,
        "vision": vision,
        "logit_scale": _np(sd["logit_scale"]).reshape(()),
    }
    return jax.tree.map(lambda a: jnp.asarray(a, dtype), params)


def params_from_hf_dir(path: str, cfg: CLIPConfig | None = None, dtype=jnp.float32) -> Params:
    """Load from a HF model directory (model.safetensors [+ config.json])."""
    from safetensors.numpy import load_file

    sd = load_file(os.path.join(path, "model.safetensors"))
    if cfg is None:
        with open(os.path.join(path, "config.json")) as f:
            name = json.load(f).get("_name_or_path", "").split("/")[-1]
        cfg = get_config(name)
    return params_from_hf_state_dict(sd, cfg, dtype)


# ---------------------------------------------------------------------------
# Native checkpoint format: one safetensors file, config in metadata.
# This is the equivalent of the reference's models/vision_model.mpk
# (clip/build.rs:79-83) but covers both towers.
# ---------------------------------------------------------------------------


def _flatten(params: Params, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in params.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "/"))
        else:
            # MUST be C-contiguous: jax.device_get on TPU can return
            # F-ordered numpy for transpose-origin tensors, and safetensors
            # serializes raw memory assuming C order — without this, a
            # checkpoint saved on-TPU silently transposes those tensors
            out[key] = np.ascontiguousarray(np.asarray(v))
    return out


def _unflatten(flat: Mapping[str, np.ndarray]) -> Params:
    out: Params = {}
    for key, v in flat.items():
        parts = key.split("/")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return out


def save_checkpoint(path: str, params: Params, cfg: CLIPConfig) -> None:
    from safetensors.numpy import save_file

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat = _flatten(jax.device_get(params))
    save_file(flat, path, metadata={"config": cfg.to_json(), "format": "image_search_tpu.v1"})


def load_checkpoint(path: str, dtype=jnp.float32):
    """Returns (params, cfg)."""
    from safetensors import safe_open

    flat: Dict[str, np.ndarray] = {}
    with safe_open(path, framework="numpy") as f:
        meta = f.metadata() or {}
        for k in f.keys():
            flat[k] = f.get_tensor(k)
    cfg = CLIPConfig.from_json(meta["config"])
    params = jax.tree.map(lambda a: jnp.asarray(a, dtype), _unflatten(flat))
    return params, cfg


# canonical hub repos for the bundled presets (the reference pins its weight
# source the same way: Xenova/clip-vit-large-patch14 in clip/build.rs:10-11)
HF_REPOS = {
    "clip-vit-large-patch14": "openai/clip-vit-large-patch14",
    "clip-vit-base-patch32": "openai/clip-vit-base-patch32",
    "clip-vit-base-patch16": "openai/clip-vit-base-patch16",
    "openclip-vit-H-14": "laion/CLIP-ViT-H-14-laion2B-s32B-b79K",
    "openclip-vit-bigG-14": "laion/CLIP-ViT-bigG-14-laion2B-39B-b160k",
    "siglip-base-patch16-224": "google/siglip-base-patch16-224",
}


def convert_hf_model(
    model_ref: str,
    out_path: str,
    preset: str | None = None,
    tokenizer_out: str | None = None,
) -> CLIPConfig:
    """Fetch (hub id) or read (local HF dir) a model, convert BOTH towers,
    write one safetensors checkpoint (+ optional tokenizer files).

    The runtime equivalent of the reference's build-time weight pipeline
    (``clip/build.rs:9-11`` HF download -> codegen -> .mpk): a networked
    deployment points ``--from-hf`` at a hub id and gets a ready checkpoint;
    offline deployments pass a local directory. Returns the model config.
    """
    from image_search_tpu.config import get_config

    name = (preset or model_ref).rstrip("/").split("/")[-1]
    cfg = get_config(name)
    if cfg.arch == "siglip":
        from transformers import SiglipModel as Model

        from image_search_tpu.models.siglip import (
            params_from_hf_state_dict as convert,
        )
    else:
        from transformers import CLIPModel as Model

        convert = params_from_hf_state_dict
    model = Model.from_pretrained(model_ref)
    params = convert(model.state_dict(), cfg)
    save_checkpoint(out_path, params, cfg)
    if tokenizer_out:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(model_ref, use_fast=False)
        os.makedirs(tokenizer_out, exist_ok=True)
        tok.save_vocabulary(tokenizer_out)
    return cfg
