"""Preprocess parity: matmul-resize vs PIL bicubic / HF CLIPImageProcessor.

The reference's CPU preprocess is at ``server/src/clip.rs:153-175``
(resize_exact CatmullRom + ImageNet stats); the parity target for embeddings
is HF's CLIPImageProcessor policy (shortest-edge + center-crop + CLIP stats).
Both are covered, per SURVEY.md §7 stage 2.
"""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from image_search_tpu.ops import preprocess as pp

SIZES = [(224, 224), (64, 97), (300, 200), (480, 640), (223, 225)]


def rand_img(rng, h, w):
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _unnormalize(x, mode):
    mean, std = (pp.CLIP_MEAN, pp.CLIP_STD) if mode == "hf" else (pp.IMAGENET_MEAN, pp.IMAGENET_STD)
    return (x * np.asarray(std) + np.asarray(mean)) * 255.0


@pytest.mark.parametrize("h,w", SIZES)
def test_resize_exact_matches_pil(rng, h, w):
    """mode='reference': resize_exact(224,224) == PIL BICUBIC to <=1 LSB."""
    img = rand_img(rng, h, w)
    want = np.asarray(
        Image.fromarray(img).resize((224, 224), Image.BICUBIC)
    ).astype(np.float32)

    got = _unnormalize(np.asarray(pp.preprocess_images([img], mode="reference"))[0], "reference")
    err = np.abs(got - want)
    assert err.max() <= 1.001, err.max()
    assert err.mean() < 0.01


@pytest.mark.parametrize("h,w", [(64, 97), (300, 200), (224, 224), (640, 480)])
def test_hf_mode_matches_clip_image_processor(rng, h, w):
    """Full fused path == transformers CLIPImageProcessor (the HF policy)."""
    transformers = pytest.importorskip("transformers")
    proc = transformers.CLIPImageProcessor(
        do_resize=True,
        size={"shortest_edge": 224},
        do_center_crop=True,
        crop_size={"height": 224, "width": 224},
        do_rescale=True,
        do_normalize=True,
        image_mean=list(pp.CLIP_MEAN),
        image_std=list(pp.CLIP_STD),
        do_convert_rgb=True,
    )
    img = rand_img(rng, h, w)
    want = proc(images=Image.fromarray(img), return_tensors="np")["pixel_values"][0]
    want = want.transpose(1, 2, 0)  # CHW -> HWC

    got = np.asarray(pp.preprocess_images([img], mode="hf"))[0]
    assert got.shape == want.shape == (224, 224, 3)
    # <= 1 u8 LSB / min(std): 1/255/0.2613 ~= 0.0151 normalized units.
    err = np.abs(got - want)
    assert err.max() < 0.016, err.max()
    assert err.mean() < 0.001


def test_padding_does_not_leak(rng):
    """Bucket padding must not change results vs an unpadded computation."""
    img = rand_img(rng, 100, 150)
    alone = np.asarray(pp.preprocess_images([img], mode="hf"))[0]
    big = rand_img(rng, 700, 900)  # forces a much larger bucket
    padded = np.asarray(pp.preprocess_images([img, big], mode="hf"))[0]
    np.testing.assert_allclose(alone, padded, atol=1e-4, rtol=1e-4)


def test_reference_mode_stats():
    """mode='reference' must use ImageNet constants (clip.rs:157-159)."""
    img = np.full((50, 50, 3), 128, np.uint8)
    out = np.asarray(pp.preprocess_images([img], mode="reference"))[0]
    expect = (128 / 255 - np.array(pp.IMAGENET_MEAN)) / np.array(pp.IMAGENET_STD)
    np.testing.assert_allclose(out[100 // 2, 100 // 2], expect, atol=1e-3)


def test_grayscale_and_rgba_handled(rng):
    gray = rng.integers(0, 256, size=(80, 80), dtype=np.uint8)
    rgba = rng.integers(0, 256, size=(80, 80, 4), dtype=np.uint8)
    out = np.asarray(pp.preprocess_images([gray, rgba]))
    assert out.shape == (2, 224, 224, 3)
    assert np.isfinite(out).all()


def test_upscale_small_image(rng):
    img = rand_img(rng, 32, 48)
    want = np.asarray(Image.fromarray(img).resize((224, 224), Image.BICUBIC)).astype(np.float32)
    got = _unnormalize(np.asarray(pp.preprocess_images([img], mode="reference"))[0], "reference")
    assert np.abs(got - want).max() <= 1.001


def test_bf16_output_dtype(rng):
    img = rand_img(rng, 64, 64)
    out = pp.preprocess_images([img], out_dtype=jnp.bfloat16)
    assert out.dtype == jnp.bfloat16


def test_oversized_image_bucket(rng):
    """Images beyond the largest predefined bucket (4096) still pack/resize."""
    img = rng.integers(0, 256, size=(4100, 120, 3), dtype=np.uint8)
    out = np.asarray(pp.preprocess_images([img]))
    assert out.shape == (1, 224, 224, 3)
    assert np.isfinite(out).all()
