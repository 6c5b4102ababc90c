"""Retrieval-quality evaluation: recall@k / median rank over paired data.

Gives fine-tuning (train/finetune.py) and checkpoint conversions an
objective quality gate — the reference's only quality signal is "pritty
precise searches with just a few rounds" (its README).
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def retrieval_metrics(
    image_embeddings: np.ndarray,  # [N, D] row i pairs with text row i
    text_embeddings: np.ndarray,  # [N, D]
    ks: Sequence[int] = (1, 5, 10),
) -> Dict[str, float]:
    """Symmetric text<->image retrieval metrics over aligned pairs."""
    img = np.asarray(image_embeddings, np.float32)
    txt = np.asarray(text_embeddings, np.float32)
    img = img / np.linalg.norm(img, axis=1, keepdims=True)
    txt = txt / np.linalg.norm(txt, axis=1, keepdims=True)
    sims = txt @ img.T  # [N_text, N_image]
    n = sims.shape[0]

    def ranks(s):  # rank of the true match per row (0-based)
        order = np.argsort(-s, axis=1)
        return np.argmax(order == np.arange(n)[:, None], axis=1)

    r_t2i = ranks(sims)
    r_i2t = ranks(sims.T)
    out: Dict[str, float] = {
        "median_rank_t2i": float(np.median(r_t2i) + 1),
        "median_rank_i2t": float(np.median(r_i2t) + 1),
    }
    for k in ks:
        out[f"recall@{k}_t2i"] = float((r_t2i < k).mean())
        out[f"recall@{k}_i2t"] = float((r_i2t < k).mean())
    return out
