"""SigLIP dual-tower model (google/siglip-*) behind the same interface.

BASELINE.json config #5 asks for alternative model families behind the CLIP
interface. SigLIP differs from CLIP in exactly these ways (all handled
here, references are to HF ``transformers.SiglipModel`` semantics):

- text tower: NO causal mask (bidirectional), pooling at the LAST position
  (inputs are padded to a fixed 64 tokens), followed by a ``head`` Linear
  instead of a projection matrix;
- vision tower: patch conv WITH bias, no class token, and a MAP
  (multihead-attention-pooling) head — a learned probe token attends over
  the encoded patches, then LayerNorm + residual MLP;
- gelu_tanh activations, layernorm eps 1e-6 (driven by config, not code);
- similarity is ``exp(logit_scale) * cos + logit_bias`` with a sigmoid
  (pairwise) training loss rather than softmax InfoNCE.

The pytree layout extends the CLIP one, so checkpoints flow through the
same ``save_checkpoint``/``load_checkpoint`` (models/convert.py). Parity vs
``transformers.SiglipModel`` is tested in tests/test_siglip.py.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from image_search_tpu.config import CLIPConfig
from image_search_tpu.models.clip import (
    Params,
    _encoder,
    _layer_norm,
    _mlp,
    l2_normalize,
    patchify,
)


def encode_text(
    params: Params,
    cfg: CLIPConfig,
    input_ids: jax.Array,
    compute_dtype: jnp.dtype = jnp.float32,
    normalize: bool = False,
    remat: bool = False,
) -> jax.Array:
    """Text ids [B, 64] -> [B, projection_dim]; last-token pooling + head."""
    t = params["text"]
    tc = cfg.text
    B, S = input_ids.shape
    x = t["token_embedding"][input_ids] + t["position_embedding"][:S]
    x = x.astype(compute_dtype)
    x = _encoder(x, t["blocks"], tc, causal=False, remat=remat)  # bidirectional
    x = _layer_norm(x, t["final_ln_scale"], t["final_ln_bias"], tc.layernorm_eps)
    pooled = x[:, -1]  # fixed-length padded input: last position
    emb = (
        jnp.einsum("bd,dp->bp", pooled, t["head_w"].astype(pooled.dtype))
        + t["head_b"].astype(pooled.dtype)
    )
    if normalize:
        emb = l2_normalize(emb)
    return emb


def _map_head(x: jax.Array, head: Params, cfg: CLIPConfig) -> jax.Array:
    """Multihead-attention pooling: learned probe attends over patch tokens."""
    vc = cfg.vision
    B, S, D = x.shape
    H, Hd = vc.num_heads, vc.head_dim
    dtype = x.dtype

    probe = jnp.broadcast_to(head["probe"].astype(dtype), (B, 1, D))
    q = jnp.einsum("bqd,de->bqe", probe, head["q_w"].astype(dtype)) + head["q_b"].astype(dtype)
    k = jnp.einsum("bsd,de->bse", x, head["k_w"].astype(dtype)) + head["k_b"].astype(dtype)
    v = jnp.einsum("bsd,de->bse", x, head["v_w"].astype(dtype)) + head["v_b"].astype(dtype)

    q = q.reshape(B, 1, H, Hd)
    k = k.reshape(B, S, H, Hd)
    v = v.reshape(B, S, H, Hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * float(Hd**-0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
    attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, 1, D)
    attn = jnp.einsum("bqd,de->bqe", attn, head["o_w"].astype(dtype)) + head["o_b"].astype(dtype)

    residual = attn
    h = _layer_norm(attn, head["ln_scale"], head["ln_bias"], cfg.vision.layernorm_eps)
    h = residual + _mlp(h, head, cfg.vision)
    return h[:, 0]


def encode_image(
    params: Params,
    cfg: CLIPConfig,
    pixels: jax.Array,
    compute_dtype: jnp.dtype = jnp.float32,
    normalize: bool = False,
    remat: bool = False,
) -> jax.Array:
    """Preprocessed NHWC pixels -> [B, projection_dim] via the MAP head."""
    v = params["vision"]
    vc = cfg.vision
    patches = patchify(pixels.astype(compute_dtype), vc.patch_size)
    x = (
        jnp.einsum("bnk,kd->bnd", patches, v["patch_embedding"].astype(compute_dtype))
        + v["patch_bias"].astype(compute_dtype)
    )
    x = x + v["position_embedding"].astype(compute_dtype)
    x = _encoder(x, v["blocks"], vc, causal=False, remat=remat)
    x = _layer_norm(x, v["post_ln_scale"], v["post_ln_bias"], vc.layernorm_eps)
    emb = _map_head(x, v["head"], cfg)
    if normalize:
        emb = l2_normalize(emb)
    return emb


def forward(params, cfg, input_ids, pixels, compute_dtype=jnp.float32, remat=False):
    """Returns (img_emb, txt_emb, logit_scale, logit_bias); embeddings
    l2-normalized. Pairwise logits = scale * img @ txt.T + bias."""
    img = encode_image(params, cfg, pixels, compute_dtype, normalize=True, remat=remat)
    txt = encode_text(params, cfg, input_ids, compute_dtype, normalize=True, remat=remat)
    scale = jnp.exp(params["logit_scale"].astype(jnp.float32))
    bias = params["logit_bias"].astype(jnp.float32)
    return img, txt, scale, bias


def sigmoid_loss(img_emb, txt_emb, scale, bias):
    """SigLIP's pairwise sigmoid objective (positive diagonal)."""
    logits = scale * jnp.einsum("bp,cp->bc", img_emb, txt_emb) + bias
    B = logits.shape[0]
    labels = 2.0 * jnp.eye(B) - 1.0  # +1 diagonal, -1 elsewhere
    return -jnp.mean(jax.nn.log_sigmoid(labels * logits))


def init_params(key: jax.Array, cfg: CLIPConfig, dtype=jnp.float32) -> Params:
    """Random init with the SigLIP pytree layout (demo/test use)."""
    from image_search_tpu.models.clip import _init_tower_blocks

    ks = jax.random.split(key, 14)
    tc, vc = cfg.text, cfg.vision
    D = vc.hidden_size
    patch_dim = vc.patch_size * vc.patch_size * 3

    def w(k, shape, scale):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    text = {
        "token_embedding": w(ks[0], (tc.vocab_size, tc.hidden_size), 0.02),
        "position_embedding": w(ks[1], (tc.context_length, tc.hidden_size), 0.01),
        "blocks": _init_tower_blocks(ks[2], tc, dtype),
        "final_ln_scale": jnp.ones((tc.hidden_size,), dtype),
        "final_ln_bias": jnp.zeros((tc.hidden_size,), dtype),
        "head_w": w(ks[3], (tc.hidden_size, cfg.projection_dim), tc.hidden_size**-0.5),
        "head_b": jnp.zeros((cfg.projection_dim,), dtype),
    }
    s = D**-0.5
    head = {
        "probe": w(ks[4], (D,), 0.02),
        "q_w": w(ks[5], (D, D), s), "q_b": jnp.zeros((D,), dtype),
        "k_w": w(ks[6], (D, D), s), "k_b": jnp.zeros((D,), dtype),
        "v_w": w(ks[7], (D, D), s), "v_b": jnp.zeros((D,), dtype),
        "o_w": w(ks[8], (D, D), s), "o_b": jnp.zeros((D,), dtype),
        "ln_scale": jnp.ones((D,), dtype), "ln_bias": jnp.zeros((D,), dtype),
        "fc_w": w(ks[9], (D, vc.mlp_size), s), "fc_b": jnp.zeros((vc.mlp_size,), dtype),
        "proj_w": w(ks[10], (vc.mlp_size, D), vc.mlp_size**-0.5),
        "proj_b": jnp.zeros((D,), dtype),
    }
    vision = {
        "patch_embedding": w(ks[11], (patch_dim, D), patch_dim**-0.5),
        "patch_bias": jnp.zeros((D,), dtype),
        # ks[12]/ks[13], NOT ks[4]/ks[5]: reusing the head's keys correlated
        # the probe/q_w with position embeddings/blocks (code-review find)
        "position_embedding": w(ks[12], (vc.seq_len, D), 0.01),
        "blocks": _init_tower_blocks(ks[13], vc, dtype),
        "post_ln_scale": jnp.ones((D,), dtype),
        "post_ln_bias": jnp.zeros((D,), dtype),
        "head": head,
    }
    return {
        "text": text,
        "vision": vision,
        "logit_scale": jnp.asarray(cfg.logit_scale_init, jnp.float32),
        "logit_bias": jnp.asarray(cfg.logit_bias_init or 0.0, jnp.float32),
    }


# ---------------------------------------------------------------------------
# HF conversion (transformers.SiglipModel state_dict)
# ---------------------------------------------------------------------------


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return np.asarray(t, np.float32)
    return np.asarray(t.detach().cpu().float().numpy(), np.float32)


def params_from_hf_state_dict(sd: Mapping[str, Any], cfg: CLIPConfig, dtype=jnp.float32) -> Params:
    from image_search_tpu.models.convert import _stack_tower_blocks

    tc, vc = cfg.text, cfg.vision
    text = {
        "token_embedding": _np(sd["text_model.embeddings.token_embedding.weight"]),
        "position_embedding": _np(sd["text_model.embeddings.position_embedding.weight"]),
        "blocks": _stack_tower_blocks(sd, "text_model.encoder", tc.num_layers),
        "final_ln_scale": _np(sd["text_model.final_layer_norm.weight"]),
        "final_ln_bias": _np(sd["text_model.final_layer_norm.bias"]),
        "head_w": _np(sd["text_model.head.weight"]).T,
        "head_b": _np(sd["text_model.head.bias"]),
    }

    conv = _np(sd["vision_model.embeddings.patch_embedding.weight"])
    D = conv.shape[0]
    # torch nn.MultiheadAttention packs qkv into in_proj
    in_w = _np(sd["vision_model.head.attention.in_proj_weight"])  # [3D, D]
    in_b = _np(sd["vision_model.head.attention.in_proj_bias"])
    q_w, k_w, v_w = np.split(in_w, 3, axis=0)
    q_b, k_b, v_b = np.split(in_b, 3, axis=0)
    head = {
        "probe": _np(sd["vision_model.head.probe"]).reshape(-1),
        "q_w": q_w.T, "q_b": q_b,
        "k_w": k_w.T, "k_b": k_b,
        "v_w": v_w.T, "v_b": v_b,
        "o_w": _np(sd["vision_model.head.attention.out_proj.weight"]).T,
        "o_b": _np(sd["vision_model.head.attention.out_proj.bias"]),
        "ln_scale": _np(sd["vision_model.head.layernorm.weight"]),
        "ln_bias": _np(sd["vision_model.head.layernorm.bias"]),
        "fc_w": _np(sd["vision_model.head.mlp.fc1.weight"]).T,
        "fc_b": _np(sd["vision_model.head.mlp.fc1.bias"]),
        "proj_w": _np(sd["vision_model.head.mlp.fc2.weight"]).T,
        "proj_b": _np(sd["vision_model.head.mlp.fc2.bias"]),
    }
    vision = {
        "patch_embedding": conv.transpose(2, 3, 1, 0).reshape(-1, D),
        "patch_bias": _np(sd["vision_model.embeddings.patch_embedding.bias"]),
        "position_embedding": _np(sd["vision_model.embeddings.position_embedding.weight"]),
        "blocks": _stack_tower_blocks(sd, "vision_model.encoder", vc.num_layers),
        "post_ln_scale": _np(sd["vision_model.post_layernorm.weight"]),
        "post_ln_bias": _np(sd["vision_model.post_layernorm.bias"]),
        "head": head,
    }
    params = {
        "text": text,
        "vision": vision,
        "logit_scale": _np(sd["logit_scale"]).reshape(()),
        "logit_bias": _np(sd["logit_bias"]).reshape(()),
    }
    return jax.tree.map(lambda a: jnp.asarray(a, dtype), params)
