"""SigLIP tower parity vs transformers.SiglipModel (random weights,
architecture-exact — same method as test_model_parity)."""

import numpy as np
import pytest

import jax.numpy as jnp

from image_search_tpu.config import CLIPConfig, TextConfig, VisionConfig
from image_search_tpu.models import siglip

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def tiny_siglip_config() -> CLIPConfig:
    return CLIPConfig(
        name="siglip-tiny-test",
        text=TextConfig(
            hidden_size=64, num_layers=2, num_heads=4, act="gelu_tanh",
            layernorm_eps=1e-6, vocab_size=256, context_length=16, eos_token_id=1,
        ),
        vision=VisionConfig(
            hidden_size=64, num_layers=2, num_heads=4, act="gelu_tanh",
            layernorm_eps=1e-6, image_size=32, patch_size=16, no_class_token=True,
        ),
        projection_dim=64,
        arch="siglip",
        logit_scale_init=0.0,
        logit_bias_init=-10.0,
    )


@pytest.fixture(scope="module")
def pair():
    from transformers import SiglipConfig, SiglipModel

    cfg = tiny_siglip_config()
    hf_cfg = SiglipConfig(
        text_config=dict(
            vocab_size=cfg.text.vocab_size,
            hidden_size=cfg.text.hidden_size,
            intermediate_size=cfg.text.mlp_size,
            num_hidden_layers=cfg.text.num_layers,
            num_attention_heads=cfg.text.num_heads,
            max_position_embeddings=cfg.text.context_length,
            hidden_act="gelu_pytorch_tanh",
            layer_norm_eps=cfg.text.layernorm_eps,
        ),
        vision_config=dict(
            hidden_size=cfg.vision.hidden_size,
            intermediate_size=cfg.vision.mlp_size,
            num_hidden_layers=cfg.vision.num_layers,
            num_attention_heads=cfg.vision.num_heads,
            image_size=cfg.vision.image_size,
            patch_size=cfg.vision.patch_size,
            hidden_act="gelu_pytorch_tanh",
            layer_norm_eps=cfg.vision.layernorm_eps,
        ),
    )
    torch.manual_seed(0)
    model = transformers.SiglipModel(hf_cfg).eval()
    params = siglip.params_from_hf_state_dict(model.state_dict(), cfg)
    return cfg, model, params


def cosine(a, b):
    a = a / np.linalg.norm(a, axis=-1, keepdims=True)
    b = b / np.linalg.norm(b, axis=-1, keepdims=True)
    return (a * b).sum(-1)


def test_siglip_text_parity(pair, rng):
    cfg, model, params = pair
    ids = rng.integers(2, cfg.text.vocab_size, size=(3, cfg.text.context_length)).astype(np.int32)
    with torch.no_grad():
        want = model.get_text_features(input_ids=torch.from_numpy(ids.astype(np.int64))).numpy()
    got = np.asarray(siglip.encode_text(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)
    assert cosine(got, want).min() > 0.99999


def test_siglip_vision_parity(pair, rng):
    cfg, model, params = pair
    pixels = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = model.get_image_features(
            pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2))
        ).numpy()
    got = np.asarray(siglip.encode_image(params, cfg, jnp.asarray(pixels)))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)
    assert cosine(got, want).min() > 0.99999


def test_siglip_logits_parity(pair, rng):
    cfg, model, params = pair
    ids = rng.integers(2, cfg.text.vocab_size, size=(2, cfg.text.context_length)).astype(np.int32)
    pixels = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    img, txt, scale, bias = siglip.forward(params, cfg, jnp.asarray(ids), jnp.asarray(pixels))
    got = np.asarray(scale * np.asarray(img) @ np.asarray(txt).T + bias)
    with torch.no_grad():
        out = model(
            input_ids=torch.from_numpy(ids.astype(np.int64)),
            pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2)),
        )
    np.testing.assert_allclose(got, out.logits_per_image.numpy(), rtol=1e-3, atol=1e-4)


def test_sigmoid_loss_finite(pair, rng):
    cfg, _, params = pair
    ids = rng.integers(2, cfg.text.vocab_size, size=(4, 16)).astype(np.int32)
    pixels = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
    img, txt, scale, bias = siglip.forward(params, cfg, jnp.asarray(ids), jnp.asarray(pixels))
    loss = siglip.sigmoid_loss(img, txt, scale, bias)
    assert np.isfinite(float(loss))
