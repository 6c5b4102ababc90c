"""ISX_VIT_SPAD: end-to-end padded-sequence vision tower (S=257 -> 264).

Round-4 verdict #8 / PERF_NOTES round-3 attention close: keeping the
vision sequence zero-padded to the split kernel's aligned Sp through ALL
layers removes the per-call HBM pad/slice that made the per-layer
split-key A/B negative. These tests pin the SEMANTICS on CPU (the
reference-path branch + the pre-padded kernel in interpret mode); the
perf question is answered on the real chip (benchmarks/RESULTS.md).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tiny_s257_cfg():
    """Vision S = (128/8)^2 + 1 = 257 — the ViT-L/14 alignment regime at
    toy width."""
    from image_search_tpu.config import CLIPConfig, TextConfig, VisionConfig

    return CLIPConfig(
        name="spad-test",
        text=TextConfig(hidden_size=64, num_layers=2, num_heads=4,
                        vocab_size=64, context_length=8, eos_token_id=2),
        vision=VisionConfig(hidden_size=64, num_layers=3, num_heads=4,
                            image_size=128, patch_size=8),
        projection_dim=32,
    )


@pytest.fixture()
def s257_setup():
    from image_search_tpu.models import init_params

    cfg = _tiny_s257_cfg()
    params = init_params(jax.random.key(7), cfg)
    pixels = jax.random.normal(jax.random.key(8), (2, 128, 128, 3), jnp.float32)
    return cfg, params, pixels


@pytest.mark.parametrize("cls_last", ["0", "1"])
def test_spad_embeddings_exact(s257_setup, monkeypatch, cls_last):
    """Padded-path embeddings == unpadded, bitwise, through both the full
    scan and the CLS-only-last-layer path (pad rows feed every layer as
    masked keys; only row 0 is ever pooled)."""
    from image_search_tpu.models.clip import encode_image

    cfg, params, pixels = s257_setup
    monkeypatch.setenv("ISX_CLS_LAST", cls_last)
    base = np.asarray(encode_image(params, cfg, pixels))

    monkeypatch.setenv("ISX_VIT_SPAD", "264")
    monkeypatch.setenv("ISX_VIT_SPAD_CPU", "1")
    padded = np.asarray(encode_image(params, cfg, pixels))
    np.testing.assert_array_equal(base, padded)


def test_spad_invalid_pad_rejected(s257_setup, monkeypatch):
    """Sp must be (S//128)*128 + 8 — anything else is a config error, not
    silent wrong math."""
    from image_search_tpu.models.clip import encode_image

    cfg, params, pixels = s257_setup
    monkeypatch.setenv("ISX_VIT_SPAD", "384")
    monkeypatch.setenv("ISX_VIT_SPAD_CPU", "1")
    with pytest.raises(ValueError, match="ISX_VIT_SPAD"):
        encode_image(params, cfg, pixels)


def test_spad_ignored_off_regime(monkeypatch):
    """S=65 (image 64, patch 8) is outside the split-kernel regime: the
    flag must be a no-op there (clip-tiny-test servers set no flags, but a
    global env must not break small models)."""
    from image_search_tpu.config import CLIPConfig, TextConfig, VisionConfig
    from image_search_tpu.models import init_params
    from image_search_tpu.models.clip import encode_image

    cfg = CLIPConfig(
        name="spad-small",
        text=TextConfig(hidden_size=32, num_layers=1, num_heads=2,
                        vocab_size=32, context_length=8, eos_token_id=2),
        vision=VisionConfig(hidden_size=32, num_layers=1, num_heads=2,
                            image_size=64, patch_size=8),
        projection_dim=16,
    )
    params = init_params(jax.random.key(1), cfg)
    pixels = jax.random.normal(jax.random.key(2), (1, 64, 64, 3), jnp.float32)
    base = np.asarray(encode_image(params, cfg, pixels))
    monkeypatch.setenv("ISX_VIT_SPAD", "264")
    monkeypatch.setenv("ISX_VIT_SPAD_CPU", "1")
    got = np.asarray(encode_image(params, cfg, pixels))
    np.testing.assert_array_equal(base, got)


def test_split_padded_kernel_matches_reference():
    """fused_attention_split_padded (pre-padded operands, garbage pad
    rows) == reference over the real rows — interpret mode, S=129/Sp=136."""
    from image_search_tpu.ops.attention import (
        attention_reference,
        fused_attention_split_padded,
    )

    B, S, H, Hd = 2, 129, 4, 16
    Sp = 136
    ks = jax.random.split(jax.random.key(3), 3)
    q, k, v = (jax.random.normal(kk, (B, Sp, H * Hd), jnp.float32) for kk in ks)
    # pad rows carry GARBAGE on purpose: the kernel must mask by index
    got = fused_attention_split_padded(q, k, v, H, S, 0.25, True)[:, :S]
    want = attention_reference(
        q[:, :S].reshape(B, S, H, Hd),
        k[:, :S].reshape(B, S, H, Hd),
        v[:, :S].reshape(B, S, H, Hd),
        sm_scale=0.25,
    ).reshape(B, S, H * Hd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
