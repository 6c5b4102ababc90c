"""Host decode throughput ladder: threads x formats (VERDICT round-1 item 4).

Measures the native decoder's aggregate throughput with 1/2/4/8 worker
threads over a synthetic in-memory corpus. On a single-core VM the expected
curve is FLAT (ctypes releases the GIL, so threads time-slice without
Python-level serialization); on an N-core host the same harness shows the
linear scaling the ingest pipeline relies on. Run:
    python benchmarks/decode_scaling.py [--megapixels 2.0] [--count 48]
"""

from __future__ import annotations

import argparse
import io
import json
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
from PIL import Image

from image_search_tpu.ingest import native_decode


def make_corpus(fmt: str, mp: float, count: int):
    side = int((mp * 1e6) ** 0.5)
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (side // 8, side // 8, 3), dtype=np.uint8)
    img = Image.fromarray(base).resize((side, side), Image.BILINEAR)
    buf = io.BytesIO()
    img.save(buf, fmt, quality=90) if fmt in ("JPEG", "WEBP") else img.save(buf, fmt)
    return [buf.getvalue()] * count


def run(fmt: str, blobs, workers: int, max_side: int) -> float:
    def one(b):
        out = native_decode.decode_bytes(b, max_side)
        assert out is not None
        return out.shape

    with ThreadPoolExecutor(max_workers=workers) as pool:
        list(pool.map(one, blobs[:2]))  # warm
        t0 = time.perf_counter()
        list(pool.map(one, blobs))
        dt = time.perf_counter() - t0
    return len(blobs) / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--megapixels", type=float, default=2.0)
    ap.add_argument("--count", type=int, default=48)
    ap.add_argument("--max-side", type=int, default=224)
    args = ap.parse_args()
    assert native_decode.available(), "build the decoder: make -C native"
    for fmt in ("JPEG", "PNG", "WEBP", "GIF", "BMP", "TIFF"):
        blobs = make_corpus(fmt, args.megapixels, args.count)
        row = {"format": fmt, "megapixels": args.megapixels}
        for workers in (1, 2, 4, 8):
            ips = run(fmt, blobs, workers, args.max_side)
            row[f"imgs_per_sec_t{workers}"] = round(ips, 1)
        print(json.dumps(row))


if __name__ == "__main__":
    main()
