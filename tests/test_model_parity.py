"""Numerical parity of the JAX CLIP towers vs HuggingFace ``CLIPModel``.

The reference delegates all model correctness to upstream crates (SURVEY.md
§4); the north star instead demands cosine agreement >= 0.999 vs HF
``clip-vit-large-patch14``. No network egress is available here, so parity is
checked architecture-exactly: a torch ``CLIPModel`` is built with random
weights, those weights are converted with
``params_from_hf_state_dict``, and outputs must agree to float tolerance.
Architecture parity + weight-conversion parity == checkpoint parity.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from image_search_tpu import config as cfglib
from image_search_tpu.models import clip as jclip
from image_search_tpu.models.convert import (
    load_checkpoint,
    params_from_hf_state_dict,
    save_checkpoint,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def build_hf_clip(cfg: cfglib.CLIPConfig):
    from transformers import CLIPConfig, CLIPModel, CLIPTextConfig, CLIPVisionConfig

    text_cfg = CLIPTextConfig(
        vocab_size=cfg.text.vocab_size,
        hidden_size=cfg.text.hidden_size,
        intermediate_size=cfg.text.mlp_size,
        num_hidden_layers=cfg.text.num_layers,
        num_attention_heads=cfg.text.num_heads,
        max_position_embeddings=cfg.text.context_length,
        hidden_act="quick_gelu",
        layer_norm_eps=cfg.text.layernorm_eps,
        eos_token_id=cfg.text.eos_token_id,
        bos_token_id=cfg.text.eos_token_id - 1,
        pad_token_id=0,
    )
    vision_cfg = CLIPVisionConfig(
        hidden_size=cfg.vision.hidden_size,
        intermediate_size=cfg.vision.mlp_size,
        num_hidden_layers=cfg.vision.num_layers,
        num_attention_heads=cfg.vision.num_heads,
        image_size=cfg.vision.image_size,
        patch_size=cfg.vision.patch_size,
        hidden_act="quick_gelu",
        layer_norm_eps=cfg.vision.layernorm_eps,
    )
    hf_cfg = CLIPConfig.from_text_vision_configs(
        text_cfg, vision_cfg, projection_dim=cfg.projection_dim
    )
    torch.manual_seed(0)
    model = transformers.CLIPModel(hf_cfg).eval()
    return model


def make_text_ids(cfg: cfglib.CLIPConfig, batch: int, rng) -> np.ndarray:
    tc = cfg.text
    ids = rng.integers(1, tc.eos_token_id - 1, size=(batch, tc.context_length))
    # bos + tokens + eos, then pad with eos (CLIP tokenizer pads with eot)
    ids[:, 0] = tc.eos_token_id - 1
    for b in range(batch):
        eos_at = rng.integers(3, tc.context_length)
        ids[b, eos_at:] = tc.eos_token_id
    return ids.astype(np.int32)


def cosine(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    a = a / np.linalg.norm(a, axis=-1, keepdims=True)
    b = b / np.linalg.norm(b, axis=-1, keepdims=True)
    return (a * b).sum(-1)


@pytest.fixture(scope="module")
def tiny_pair(rng):
    cfg = cfglib.tiny_test_config()
    model = build_hf_clip(cfg)
    params = params_from_hf_state_dict(model.state_dict(), cfg)
    return cfg, model, params


def test_text_tower_parity(tiny_pair, rng):
    cfg, model, params = tiny_pair
    ids = make_text_ids(cfg, 4, rng)
    with torch.no_grad():
        want = model.get_text_features(input_ids=torch.from_numpy(ids.astype(np.int64))).numpy()
    got = np.asarray(jclip.encode_text(params, cfg, jnp.asarray(ids)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    assert cosine(got, want).min() > 0.99999


def test_vision_tower_parity(tiny_pair, rng):
    cfg, model, params = tiny_pair
    vc = cfg.vision
    pixels = rng.normal(size=(3, vc.image_size, vc.image_size, 3)).astype(np.float32)
    with torch.no_grad():
        want = model.get_image_features(
            pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2))
        ).numpy()
    got = np.asarray(jclip.encode_image(params, cfg, jnp.asarray(pixels)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    assert cosine(got, want).min() > 0.99999


def test_full_forward_logit_scale(tiny_pair, rng):
    cfg, model, params = tiny_pair
    ids = make_text_ids(cfg, 2, rng)
    pixels = rng.normal(size=(2, 28, 28, 3)).astype(np.float32)
    img, txt, scale = jclip.forward(params, cfg, jnp.asarray(ids), jnp.asarray(pixels))
    with torch.no_grad():
        out = model(
            input_ids=torch.from_numpy(ids.astype(np.int64)),
            pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2)),
        )
        want_logits = out.logits_per_image.numpy()
    got_logits = np.asarray(scale * np.asarray(img) @ np.asarray(txt).T)
    np.testing.assert_allclose(got_logits, want_logits, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_vit_l14_full_size_parity(rng):
    """Full ViT-L/14 dims (random weights): the exact production topology."""
    cfg = cfglib.clip_vit_l14()
    model = build_hf_clip(cfg)
    params = params_from_hf_state_dict(model.state_dict(), cfg)

    ids = make_text_ids(cfg, 2, rng)
    pixels = rng.normal(size=(2, 224, 224, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        want_t = model.get_text_features(input_ids=torch.from_numpy(ids.astype(np.int64))).numpy()
        want_v = model.get_image_features(
            pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2))
        ).numpy()
    got_t = np.asarray(jclip.encode_text(params, cfg, jnp.asarray(ids)))
    got_v = np.asarray(jclip.encode_image(params, cfg, jnp.asarray(pixels)))
    # 24 f32 layers of accumulated reassociation: cosine is the honest metric.
    assert cosine(got_t, want_t).min() > 0.9999
    assert cosine(got_v, want_v).min() > 0.9999


def test_checkpoint_roundtrip(tiny_pair, tmp_path, rng):
    cfg, _, params = tiny_pair
    path = str(tmp_path / "ckpt.safetensors")
    save_checkpoint(path, params, cfg)
    params2, cfg2 = load_checkpoint(path)
    assert cfg2 == cfg
    ids = make_text_ids(cfg, 2, rng)
    a = np.asarray(jclip.encode_text(params, cfg, jnp.asarray(ids)))
    b = np.asarray(jclip.encode_text(params2, cfg2, jnp.asarray(ids)))
    np.testing.assert_array_equal(a, b)


def test_cls_only_last_layer_matches_full_scan(tiny_pair, rng, monkeypatch):
    """The CLS-only final vision layer (ISX_CLS_LAST, default on) is an
    exact-FLOP reduction: its output must match the full L-layer scan to
    float round-off in f32 and stay cosine-identical in bf16."""
    cfg, _, params = tiny_pair
    pixels = rng.normal(size=(3, 28, 28, 3)).astype(np.float32)
    px = jnp.asarray(pixels)

    monkeypatch.setenv("ISX_CLS_LAST", "1")
    cls_f32 = np.asarray(jclip.encode_image(params, cfg, px))
    cls_bf16 = np.asarray(
        jclip.encode_image(params, cfg, px, compute_dtype=jnp.bfloat16)
    ).astype(np.float32)
    monkeypatch.setenv("ISX_CLS_LAST", "0")
    full_f32 = np.asarray(jclip.encode_image(params, cfg, px))
    full_bf16 = np.asarray(
        jclip.encode_image(params, cfg, px, compute_dtype=jnp.bfloat16)
    ).astype(np.float32)

    np.testing.assert_allclose(cls_f32, full_f32, rtol=1e-5, atol=1e-6)
    assert cosine(cls_f32, full_f32).min() > 0.999999
    # bf16: the truncated path rounds differently (row-0 matmuls vs the
    # batched scan), but must stay embedding-equivalent
    assert cosine(cls_bf16, full_bf16).min() > 0.999


def test_eos_only_last_text_layer_matches_full_scan(tiny_pair, rng, monkeypatch):
    """The EOS-only final text layer (ISX_EOS_LAST, default on) must match
    the full scan: per-row pooled positions vary, exercising the gathered
    query row and the explicit causal column mask."""
    cfg, _, params = tiny_pair
    ids = make_text_ids(cfg, 5, rng)  # varied eos positions per row
    idsj = jnp.asarray(ids)

    monkeypatch.setenv("ISX_EOS_LAST", "1")
    eos_f32 = np.asarray(jclip.encode_text(params, cfg, idsj))
    monkeypatch.setenv("ISX_EOS_LAST", "0")
    full_f32 = np.asarray(jclip.encode_text(params, cfg, idsj))

    np.testing.assert_allclose(eos_f32, full_f32, rtol=1e-5, atol=1e-6)
    assert cosine(eos_f32, full_f32).min() > 0.999999


def test_cls_only_remat_path_unchanged(tiny_pair, rng):
    """remat=True (training) must keep the full scan regardless of the env
    gate — ZeRO-3 shards the stacked layer axis (see encode_image)."""
    cfg, _, params = tiny_pair
    pixels = rng.normal(size=(2, 28, 28, 3)).astype(np.float32)
    px = jnp.asarray(pixels)
    a = np.asarray(jclip.encode_image(params, cfg, px, remat=True))
    import os

    old = os.environ.pop("ISX_CLS_LAST", None)
    try:
        os.environ["ISX_CLS_LAST"] = "0"
        b = np.asarray(jclip.encode_image(params, cfg, px))
    finally:
        if old is None:
            os.environ.pop("ISX_CLS_LAST", None)
        else:
            os.environ["ISX_CLS_LAST"] = old
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_bf16_policy_close_to_f32(tiny_pair, rng):
    """bf16 compute must stay directionally faithful (cosine > 0.99)."""
    cfg, _, params = tiny_pair
    pixels = rng.normal(size=(2, 28, 28, 3)).astype(np.float32)
    f32 = np.asarray(jclip.encode_image(params, cfg, jnp.asarray(pixels)))
    bf16 = np.asarray(
        jclip.encode_image(params, cfg, jnp.asarray(pixels), compute_dtype=jnp.bfloat16)
    ).astype(np.float32)
    assert cosine(f32, bf16).min() > 0.99


def test_openclip_gelu_variant_parity(rng):
    """OpenCLIP bigG-style config (plain gelu instead of quick_gelu) must
    match an HF CLIPModel built with hidden_act='gelu' — covers the
    openclip-vit-bigG-14 preset's numerics at tiny dims."""
    cfg = cfglib.CLIPConfig(
        name="openclip-tiny-test",
        text=cfglib.TextConfig(
            hidden_size=64, num_layers=2, num_heads=4, act="gelu",
            vocab_size=128, context_length=16, eos_token_id=127,
        ),
        vision=cfglib.VisionConfig(
            hidden_size=96, num_layers=2, num_heads=4, act="gelu",
            image_size=28, patch_size=14, mlp_size_override=512,
        ),
        projection_dim=32,
    )
    from transformers import CLIPConfig as HFConfig, CLIPModel

    hf_cfg = HFConfig(
        text_config=dict(
            vocab_size=128, hidden_size=64, intermediate_size=256,
            num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=16, hidden_act="gelu",
            eos_token_id=127, bos_token_id=126, pad_token_id=0,
        ),
        vision_config=dict(
            hidden_size=96, intermediate_size=512, num_hidden_layers=2,
            num_attention_heads=4, image_size=28, patch_size=14,
            hidden_act="gelu",
        ),
        projection_dim=32,
    )
    torch.manual_seed(1)
    model = CLIPModel(hf_cfg).eval()
    params = params_from_hf_state_dict(model.state_dict(), cfg)

    ids = make_text_ids(cfg, 2, rng)
    pixels = rng.normal(size=(2, 28, 28, 3)).astype(np.float32)
    with torch.no_grad():
        want_t = model.get_text_features(input_ids=torch.from_numpy(ids.astype(np.int64))).numpy()
        want_v = model.get_image_features(
            pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2))
        ).numpy()
    got_t = np.asarray(jclip.encode_text(params, cfg, jnp.asarray(ids)))
    got_v = np.asarray(jclip.encode_image(params, cfg, jnp.asarray(pixels)))
    assert cosine(got_t, want_t).min() > 0.99999
    assert cosine(got_v, want_v).min() > 0.99999


def test_checkpoint_handles_f_ordered_arrays(tmp_path):
    """Regression: jax.device_get on TPU yields F-contiguous numpy for
    transpose-origin tensors; safetensors writes raw memory assuming C
    order, silently transposing them. save_checkpoint must normalize."""
    cfg = cfglib.tiny_test_config()
    rng2 = np.random.default_rng(0)
    w = rng2.normal(size=(64, 32)).astype(np.float32)
    params = {"text": {"weird": w.T}}  # F-contiguous view
    assert not params["text"]["weird"].flags["C_CONTIGUOUS"]
    path = str(tmp_path / "f.safetensors")
    save_checkpoint(path, params, cfg)
    restored, _ = load_checkpoint(path)
    np.testing.assert_array_equal(np.asarray(restored["text"]["weird"]), w.T)
