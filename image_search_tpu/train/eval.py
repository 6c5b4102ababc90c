"""Retrieval evaluation over (image, caption) pair files: decode + embed +
score with the canonical metrics (utils/eval.py: bidirectional recall@k and
median rank, pessimistic about ties).

The reference has no model-quality measurement of any kind; fine-tuning
(train/finetune.py, ``--eval-dir``) uses this to show a checkpoint actually
improved before it is promoted to serving. Data layout mirrors finetune's
(.txt caption sidecars next to images, finetune.find_pairs):

    python -m image_search_tpu.train.eval --data-dir ~/pairs \
        -w models/clip.safetensors [--ks 1,5,10]

prints one JSON line of metrics.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Sequence, Tuple

import numpy as np

from image_search_tpu.utils.eval import retrieval_metrics

log = logging.getLogger(__name__)

__all__ = ["evaluate_pairs", "retrieval_metrics"]


def evaluate_pairs(
    embedder,
    pairs: List[Tuple[str, str]],
    ks: Sequence[int] = (1, 5, 10),
    batch_size: int = 64,
) -> Tuple[Dict[str, float], int]:
    """Embed (image_path, caption) pairs with ``embedder`` (ClipEmbedder)
    and score retrieval. Undecodable images are skipped with a log line
    (ingest's skip-and-log policy). Returns (metrics, pairs_evaluated)."""
    from image_search_tpu.ingest.decode import decode_image

    img_parts, texts = [], []
    for lo in range(0, len(pairs), batch_size):
        chunk = pairs[lo : lo + batch_size]
        arrs, caps = [], []
        for path, caption in chunk:
            arr = decode_image(path)
            if arr is None:
                log.warning("eval: skipping undecodable %s", path)
                continue
            arrs.append(arr)
            caps.append(caption)
        if arrs:
            img_parts.append(embedder.embed_images(arrs))
            texts.extend(caps)
    if not img_parts:
        raise ValueError("no decodable pairs to evaluate")
    image_emb = np.concatenate(img_parts, axis=0)
    text_parts = [
        embedder.embed_texts(texts[lo : lo + batch_size])
        for lo in range(0, len(texts), batch_size)
    ]
    text_emb = np.concatenate(text_parts, axis=0)
    return retrieval_metrics(image_emb, text_emb, ks), len(texts)


def main(argv=None) -> None:
    import argparse
    import json

    logging.basicConfig(level="INFO")
    ap = argparse.ArgumentParser(prog="image-search-tpu-eval")
    ap.add_argument("--data-dir", required=True,
                    help="images with .txt caption sidecars (finetune layout)")
    ap.add_argument("-w", "--model-weights", default="")
    ap.add_argument("--model", default="clip-vit-large-patch14")
    ap.add_argument("--tokenizer-dir", default="")
    ap.add_argument("--ks", default="1,5,10")
    ap.add_argument("--batch-size", type=int, default=64)
    ns = ap.parse_args(argv)

    import os

    import jax

    from image_search_tpu.config import get_config
    from image_search_tpu.models import get_model_module
    from image_search_tpu.models.convert import load_checkpoint
    from image_search_tpu.models.embedder import ClipEmbedder
    from image_search_tpu.tokenizer import CLIPBPETokenizer, HashTokenizer
    from image_search_tpu.train.finetune import find_pairs

    pairs = find_pairs(ns.data_dir)
    if not pairs:
        raise SystemExit(f"no (image, .txt caption) pairs under {ns.data_dir}")
    if ns.model_weights and os.path.exists(ns.model_weights):
        params, cfg = load_checkpoint(ns.model_weights)
    else:
        cfg = get_config(ns.model)
        log.warning("no checkpoint — RANDOM %s weights (smoke only)", cfg.name)
        params = get_model_module(cfg).init_params(jax.random.key(0), cfg)
    if ns.tokenizer_dir and os.path.exists(
        os.path.join(ns.tokenizer_dir, "vocab.json")
    ):
        tok = CLIPBPETokenizer.from_dir(ns.tokenizer_dir, cfg.text.context_length)
    else:
        tok = HashTokenizer(
            cfg.text.vocab_size, cfg.text.context_length,
            eos_id=cfg.text.eos_token_id,
        )
    embedder = ClipEmbedder(params, cfg, tokenizer=tok)
    ks = tuple(int(k) for k in ns.ks.split(","))
    metrics, n = evaluate_pairs(embedder, pairs, ks, ns.batch_size)
    print(json.dumps({"pairs": n, **metrics}))


if __name__ == "__main__":
    main()
