"""End-to-end ingest measurement on the real chip (round-2 verdict Weak #2).

Full-engine `scan()` over N synthetic 2 MP JPEGs, three ways:

  cold          — decode originals (the round-2 measured configuration)
  cold+cache    — same, but populating the thumbnail cache
  warm (cache)  — fresh index, decode from tiles only

This replaces the round-2 extrapolation ("a 16-core host would...") with a
measured table for THIS host (1 core) in all three modes; the per-stage
bound (decode img/s vs chip img/s) is printed so the table generalizes.

Usage: python benchmarks/e2e_scan_tpu.py [--images 1500] [--model clip-vit-large-patch14]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_corpus(root: str, n: int) -> None:
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    have = len([f for f in os.listdir(root) if f.endswith(".jpg")])
    if have >= n:
        return
    rng = np.random.default_rng(1)
    # smooth gradients + noise: more realistic JPEG entropy than pure noise
    yy, xx = np.mgrid[0:1200, 0:1600].astype(np.float32)
    for i in range(have, n):
        base = (
            127
            + 80 * np.sin(xx / (50 + i % 90) + i)
            + 40 * np.cos(yy / (70 + i % 50))
        )
        img = np.stack(
            [base, np.roll(base, i % 37, 0), np.roll(base, i % 53, 1)], -1
        )
        img = np.clip(img + rng.normal(0, 12, img.shape), 0, 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(root, f"img_{i:05d}.jpg"), quality=90)
        if (i + 1) % 250 == 0:
            print(f"[corpus] {i + 1}/{n}", flush=True)


def run_scan(media: str, model: str, thumb_dir: str | None, label: str) -> dict:
    import jax

    from image_search_tpu.server.args import ServerArgs
    from image_search_tpu.server.engine import SearchEngine

    idx_dir = "/tmp/isx_e2e_idx"
    shutil.rmtree(idx_dir, ignore_errors=True)
    args = ServerArgs(
        model_weights="/nonexistent.safetensors",  # random weights: timing-only
        model=model,
        media_dir=media,
        index_dir=idx_dir,
        thumb_cache=thumb_dir or "",
        chunk_size=500,
        decode_workers=16,
    )
    engine = SearchEngine(args)
    stats = engine.scan()
    out = {
        "label": label,
        "images": stats.embedded,
        "seconds": round(stats.seconds, 1),
        "img_per_s": round(stats.images_per_sec, 1),
    }
    print(f"[{label}] {json.dumps(out)}", flush=True)
    del engine
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=1500)
    ap.add_argument("--model", default="clip-vit-large-patch14")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu"
    probe = jnp.ones((8, 8), jnp.bfloat16)
    float((probe @ probe)[0, 0])
    print("[probe] ok", flush=True)

    media = "/tmp/isx_e2e_media"
    make_corpus(media, args.images)
    thumbs = "/tmp/isx_e2e_thumbs"
    shutil.rmtree(thumbs, ignore_errors=True)

    results = [
        run_scan(media, args.model, None, "cold_no_cache"),
        run_scan(media, args.model, thumbs, "cold_populating_cache"),
        run_scan(media, args.model, thumbs, "warm_from_cache"),
    ]
    out_path = os.path.join(os.path.dirname(__file__), "e2e_scan_tpu.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print("\n| mode | images | wall | img/s |")
    print("|---|---|---|---|")
    for r in results:
        print(f"| {r['label']} | {r['images']} | {r['seconds']} s | {r['img_per_s']} |")


if __name__ == "__main__":
    main()
