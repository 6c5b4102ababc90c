#!/usr/bin/env python
"""Self-contained end-to-end demo: train -> ingest -> search -> refine.

Runs fully offline on CPU in ~2 minutes (no weights, no network):

1. generates a toy photo library: colored shapes on noisy backgrounds,
   each with a caption sidecar ("a red circle", ...);
2. fine-tunes a tiny CLIP from random init on those (image, caption) pairs
   with the contrastive train step;
3. scans the library through the real ingest pipeline into the int8 index;
4. searches by text and reports retrieval quality (recall@5 per query);
5. runs a Rocchio relevance-feedback round (mark the true positives from
   round 1, re-search) and shows the improvement — the reference's whole
   product loop (README.md:5-8), measurable;
6. queries by IMAGE (any library photo as the query) — beyond the
   reference.

    python examples/end_to_end_demo.py [--steps 150]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


COLORS = {"red": (220, 40, 40), "green": (40, 200, 60), "blue": (50, 80, 230)}
SHAPES = ("circle", "square")


def draw(shape: str, color, rng, size=64) -> np.ndarray:
    img = rng.integers(90, 150, size=(size, size, 3)).astype(np.uint8)  # noisy gray
    yy, xx = np.mgrid[0:size, 0:size]
    cy, cx = rng.integers(20, size - 20, 2)
    r = rng.integers(10, 16)
    if shape == "circle":
        mask = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
    else:
        mask = (np.abs(yy - cy) <= r) & (np.abs(xx - cx) <= r)
    img[mask] = color
    return img


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--per-class", type=int, default=12)
    args = ap.parse_args()

    import jax

    # tiny-model demo: CPU is faster than shipping microbatches to a TPU
    # (set IMAGE_SEARCH_DEMO_TPU=1 to run on the accelerator anyway)
    if not os.environ.get("IMAGE_SEARCH_DEMO_TPU"):
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass

    from PIL import Image

    from image_search_tpu.config import CLIPConfig, TextConfig, VisionConfig
    from image_search_tpu.index import EmbeddingStore, VectorIndex
    from image_search_tpu.ingest import scan_directory
    from image_search_tpu.models import init_params
    from image_search_tpu.models.embedder import ClipEmbedder
    from image_search_tpu.tokenizer import train_bpe
    from image_search_tpu.train.finetune import find_pairs, run_finetune

    root = tempfile.mkdtemp(prefix="demo_")
    media = os.path.join(root, "photos")
    os.makedirs(media)
    rng = np.random.default_rng(0)
    captions = []
    for color in COLORS:
        for shape in SHAPES:
            for i in range(args.per_class):
                img = draw(shape, COLORS[color], rng)
                stem = f"{color}_{shape}_{i}"
                Image.fromarray(img).save(os.path.join(media, stem + ".png"))
                cap = f"a photo of a {color} {shape}"
                with open(os.path.join(media, stem + ".txt"), "w") as f:
                    f.write(cap)
                captions.append(cap)
    n_total = len(captions)
    print(f"[1/6] toy library: {n_total} images in {media}")

    tokenizer = train_bpe(captions, vocab_size=500, context_length=16)
    # the model's eos/vocab MUST match the tokenizer's (encode_text pools at
    # the first EOS position — a mismatch silently pools at position 0)
    cfg = CLIPConfig(
        name="demo-clip",
        text=TextConfig(hidden_size=128, num_layers=3, num_heads=4,
                        vocab_size=tokenizer.vocab_size, context_length=16,
                        eos_token_id=tokenizer.eos_id),
        vision=VisionConfig(hidden_size=128, num_layers=3, num_heads=4,
                            image_size=64, patch_size=16),
        projection_dim=64,
    )
    pairs = find_pairs(media)
    params = init_params(jax.random.key(0), cfg)

    # In-batch contrastive labels are the diagonal, so a batch must not
    # repeat a caption (6 classes here): sample one image per class.
    import optax

    from image_search_tpu.ingest.decode import decode_image
    from image_search_tpu.ops.preprocess import preprocess_images
    from image_search_tpu.train import make_train_step

    by_class = {}
    for path, cap in pairs:
        by_class.setdefault(cap, []).append(path)
    classes = sorted(by_class)
    init_fn, step_fn = make_train_step(cfg, optax.adamw(1e-3))
    state = init_fn(params)
    losses = []
    for step in range(args.steps):
        batch_paths = [by_class[c][rng.integers(len(by_class[c]))] for c in classes]
        images = [decode_image(p) for p in batch_paths]
        pixels = np.asarray(preprocess_images(images, size=cfg.vision.image_size))
        ids = tokenizer(classes)
        state, metrics = step_fn(state, ids, pixels)
        losses.append(float(metrics["loss"]))
    params = state.params
    print(f"[2/6] trained {args.steps} steps: loss {losses[0]:.3f} -> {losses[-1]:.3f}")

    embedder = ClipEmbedder(params, cfg, tokenizer=tokenizer)
    store = EmbeddingStore(os.path.join(root, "index"), cfg.projection_dim)
    index = VectorIndex(cfg.projection_dim, store=store, quantize="int8")
    stats = scan_directory(embedder, index, media, chunk_size=32)
    print(f"[3/6] scanned: {stats.embedded} embedded at {stats.images_per_sec:.0f} img/s")

    def positives(query):
        color, shape = query.split()[-2], query.split()[-1]
        return {p for p in index.paths if f"{color}_{shape}" in os.path.basename(p)}

    k = 5
    r1_recall, refined_recall = [], []
    for color in COLORS:
        for shape in SHAPES:
            q = f"a photo of a {color} {shape}"
            emb = embedder.embed_text(q)
            _, idx1 = index.search(emb, k=k)
            got1 = set(index.paths_for(idx1[0]))
            pos = positives(q)
            r1 = len(got1 & pos) / k
            r1_recall.append(r1)

            # mark round-1 true positives, re-search (the product loop)
            marked = list(got1 & pos) or list(got1)[:1]
            _, idx2 = index.search_with_feedback(emb, marked, k=k)
            got2 = set(index.paths_for(idx2[0]))
            refined_recall.append(len(got2 & pos) / k)

    print(f"[4/6] text search precision@{k}:      {np.mean(r1_recall):.2f}")
    print(f"[5/6] after one feedback round:     {np.mean(refined_recall):.2f}")
    assert np.mean(refined_recall) >= np.mean(r1_recall) - 1e-9

    # query-by-image: any library photo can BE the query. The library has 12
    # near-duplicates per class, and rows are int8-quantized, so exact
    # self-rank-1 is not guaranteed — what IS guaranteed is that the self row
    # lands in the duplicate cluster (top-12) and the top hit shares the
    # query's class.
    from image_search_tpu.ingest.decode import decode_image as _decode

    probe_path = index.paths[0]
    probe_cls = os.path.basename(probe_path).rsplit("_", 1)[0]
    probe_emb = embedder.embed_images([_decode(probe_path)])
    _, idx3 = index.search(probe_emb, k=12)
    hits = index.paths_for(idx3[0])
    rank = hits.index(probe_path) + 1 if probe_path in hits else None
    top_cls = os.path.basename(hits[0]).rsplit("_", 1)[0]
    assert rank is not None, f"query photo missing from its own top-12: {hits[:3]}"
    assert top_cls == probe_cls, f"top hit {hits[0]} is not class {probe_cls}"
    print(f"[6/6] query-by-image: query photo self-rank {rank}/12, top hit same class")
    print("demo complete — feedback round did not degrade precision")


if __name__ == "__main__":
    main()
