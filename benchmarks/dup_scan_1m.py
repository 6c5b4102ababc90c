"""Duplicate-scan wall-time at 1M rows (round-2 verdict task #5).

Builds a 1M-row index (f32 and int8), injects ~200 near-duplicate pairs,
and times `find_near_duplicates` exact vs approx on the real chip —
the number the async /duplicates job's progress bar is sized against.

Usage: python benchmarks/dup_scan_1m.py [--rows 1000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu"
    probe = jnp.ones((8, 8), jnp.bfloat16)
    float((probe @ probe)[0, 0])
    print("[probe] ok", flush=True)

    from image_search_tpu.index import VectorIndex

    DIM = 768
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((args.rows, DIM), dtype=np.float32)
    # ~200 planted near-duplicate pairs (scaled copies)
    for j in range(200):
        src, dst = j * 977, j * 977 + 500
        emb[dst] = emb[src] * (1.0 + 0.001 * (j % 7))
    paths = [f"/pictures/img_{i:07d}.jpg" for i in range(args.rows)]

    results = {}
    for quant in (None, "int8"):
        index = VectorIndex(DIM, quantize=quant, capacity=args.rows)
        t0 = time.monotonic()
        done = 0
        while done < args.rows:
            n = min(1_000_000, args.rows - done)
            index.add(paths[done : done + n], emb[done : done + n])
            done += n
        print(f"[build {quant}] {time.monotonic()-t0:.0f}s", flush=True)
        for approx in (False, True):
            t0 = time.monotonic()
            pairs = index.find_near_duplicates(threshold=0.999, approx=approx)
            dt = time.monotonic() - t0
            planted = sum(
                1 for i, j, _ in pairs if j - i == 500 and i % 977 == 0
            )
            key = f"{quant or 'f32'}_{'approx' if approx else 'exact'}"
            results[key] = {
                "seconds": round(dt, 1),
                "pairs": len(pairs),
                "planted_found": planted,
            }
            print(f"[{key}] {json.dumps(results[key])}", flush=True)
        del index

    out_path = os.path.join(os.path.dirname(__file__), "dup_scan_1m.json")
    with open(out_path, "w") as f:
        json.dump({"rows": args.rows, "results": results}, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
