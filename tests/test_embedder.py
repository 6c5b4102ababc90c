"""ClipEmbedder facade: bucketing, DP/TP mesh sharding, text+image paths."""

import numpy as np
import pytest

import jax

from image_search_tpu.config import tiny_test_config
from image_search_tpu.models import init_params
from image_search_tpu.models.embedder import ClipEmbedder
from image_search_tpu.parallel import make_mesh
from image_search_tpu.tokenizer import HashTokenizer


@pytest.fixture(scope="module")
def setup(rng):
    cfg = tiny_test_config()
    params = init_params(jax.random.key(0), cfg)
    tok = HashTokenizer(cfg.text.vocab_size, cfg.text.context_length)
    images = [
        rng.integers(0, 256, size=(40 + 7 * i, 30 + 5 * i, 3), dtype=np.uint8)
        for i in range(5)
    ]
    return cfg, params, tok, images


def test_batch_bucketing_stable(setup):
    """Embedding a batch of 5 (padded to 8) must equal per-image embeds."""
    cfg, params, tok, images = setup
    emb = ClipEmbedder(params, cfg, tokenizer=tok)
    batch = emb.embed_images(images)
    assert batch.shape == (5, cfg.projection_dim)
    for i in (0, 4):
        single = emb.embed_images([images[i]])
        np.testing.assert_allclose(batch[i], single[0], rtol=1e-4, atol=1e-5)


def test_text_path(setup):
    cfg, params, tok, _ = setup
    emb = ClipEmbedder(params, cfg, tokenizer=tok)
    out = emb.embed_texts(["a cat", "a dog", "a boat"])
    assert out.shape == (3, cfg.projection_dim)
    np.testing.assert_allclose(emb.embed_text("a cat"), out[0], atol=1e-6)


@pytest.mark.parametrize("n_data,n_model", [(8, 1), (4, 2)])
def test_mesh_sharded_embedder_matches_unsharded(setup, n_data, n_model):
    """DP and TP inference must reproduce single-device embeddings."""
    cfg, params, tok, images = setup
    base = ClipEmbedder(params, cfg, tokenizer=tok)
    want_img = base.embed_images(images)
    want_txt = base.embed_texts(["hello world", "two dogs"])

    mesh = make_mesh(n_data, n_model)
    sharded = ClipEmbedder(params, cfg, tokenizer=tok, mesh=mesh)
    got_img = sharded.embed_images(images)
    got_txt = sharded.embed_texts(["hello world", "two dogs"])
    np.testing.assert_allclose(got_img, want_img, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(got_txt, want_txt, rtol=2e-4, atol=2e-5)


def test_eos_mismatch_rejected(setup):
    """A tokenizer whose EOS differs from the model config must be rejected
    (encode_text would silently pool at position 0 otherwise)."""
    cfg, params, _, _ = setup
    bad = HashTokenizer(cfg.text.vocab_size, cfg.text.context_length, eos_id=3)
    with pytest.raises(ValueError, match="eos"):
        ClipEmbedder(params, cfg, tokenizer=bad)


def test_large_batch_split_matches_small(setup, rng):
    """Batches above MAX_DEVICE_BATCH split into sub-dispatches with
    identical results."""
    from image_search_tpu.models import embedder as emb_mod

    cfg, params, tok, _ = setup
    emb = ClipEmbedder(params, cfg, tokenizer=tok)
    images = [
        rng.integers(0, 256, size=(30, 30, 3), dtype=np.uint8) for _ in range(11)
    ]
    want = emb.embed_images(images)
    old = emb_mod.MAX_DEVICE_BATCH
    try:
        emb_mod.MAX_DEVICE_BATCH = 4  # force splitting
        got = emb.embed_images(images)
    finally:
        emb_mod.MAX_DEVICE_BATCH = old
    assert got.shape == (11, cfg.projection_dim)
    # different batch shapes -> different XLA reduction order (f32 assoc)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-4)
