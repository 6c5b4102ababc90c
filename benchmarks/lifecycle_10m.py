"""10M-row lifecycle benchmark (round-2 verdict Weak #9 / task #8).

Measures the full persistence lifecycle at production scale on the real
TPU, with the dependent-fetch timing protocol (docs/PERF_NOTES.md
"platform pathologies"):

  1. store build: append 10M f32 rows (30 GB) in 1M-row chunks
  2. cold restore: EmbeddingStore open (manifest + 10M path-line parse)
     + VectorIndex.from_store int8 re-upload + first query (compile) +
     steady-state query p50
  3. restore WITH tombstones: 1% of rows tombstoned -> liveness() cost on
     top of (2) (exercises the round-3 single-pass liveness)
  4. compact(): rewrite 30 GB dropping the dead 1%

Writes a JSON summary to benchmarks/lifecycle_10m.json and prints a
markdown table for benchmarks/RESULTS.md. Needs ~65 GB free disk.

Usage: python benchmarks/lifecycle_10m.py [--rows 10000000] [--dir DIR]
       [--keep] (keep the store for re-runs)
       [--host-only] (no TPU: skip index upload + queries; rows are zeros —
        open/liveness/tombstone/compact are path- and IO-bound, not
        value-bound, so the host-side numbers are representative. Used to
        measure the round-4 binary .pax sidecar restart win. Writes
        lifecycle_10m.host.json)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DIM = 768


def probe_tpu():
    import jax
    import jax.numpy as jnp

    x = jnp.ones((128, 128), jnp.bfloat16)
    assert float((x @ x)[0, 0]) == 128.0
    print(f"[probe] ok: {jax.devices()}", flush=True)


def fetch(arr) -> float:
    """Dependent scalar fetch — the only trustworthy sync on this tunnel."""
    return float(np.asarray(arr).ravel()[0])


def build_store(directory: str, rows: int, zeros: bool = False) -> float:
    from image_search_tpu.index import EmbeddingStore

    rng = np.random.default_rng(0)
    store = EmbeddingStore(directory, DIM)
    t0 = time.monotonic()
    chunk = 1_000_000
    done = 0
    while done < rows:
        n = min(chunk, rows - done)
        if zeros:
            emb = np.zeros((n, DIM), dtype=np.float32)
        else:
            emb = rng.standard_normal((n, DIM), dtype=np.float32)
        paths = [f"/pictures/img_{done + i:08d}.jpg" for i in range(n)]
        store.append(paths, emb)
        done += n
        print(f"[build] {done/1e6:.0f}M rows, {time.monotonic()-t0:.0f}s", flush=True)
    return time.monotonic() - t0


def restore(
    directory: str, rows: int, label: str, queries: int = 20,
    host_only: bool = False,
) -> dict:
    from image_search_tpu.index import EmbeddingStore

    out = {}
    t0 = time.monotonic()
    store = EmbeddingStore(directory, DIM)
    out["store_open_s"] = time.monotonic() - t0

    t0 = time.monotonic()
    live, dead = store.liveness()
    out["liveness_s"] = time.monotonic() - t0
    out["dead_paths"] = len(dead)

    if host_only:
        # the index restore path also walks every segment's paths — time the
        # host half of it (read + decode) without a device
        t0 = time.monotonic()
        n_paths = 0
        for paths, _emb in store.iter_shards():
            n_paths += len(paths)
        out["paths_decode_s"] = time.monotonic() - t0
        out["rows_seen"] = n_paths
        print(f"[{label}] {json.dumps(out)}", flush=True)
        return out

    from image_search_tpu.index import VectorIndex

    t0 = time.monotonic()
    index = VectorIndex.from_store(store, quantize="int8")
    out["index_upload_s"] = time.monotonic() - t0
    out["rows_live"] = len(index)

    rng = np.random.default_rng(1)
    q = rng.standard_normal((DIM,), np.float32)
    t0 = time.monotonic()
    s, i = index.search(q, k=1000)
    fetch(s)
    out["first_query_s"] = time.monotonic() - t0  # includes compile

    lat = []
    for n in range(queries):
        qn = rng.standard_normal((DIM,), np.float32)
        t0 = time.monotonic()
        s, i = index.search(qn, k=1000)
        fetch(s)
        lat.append(time.monotonic() - t0)
    lat.sort()
    out["query_p50_ms"] = round(lat[len(lat) // 2] * 1e3, 2)
    out["query_p95_ms"] = round(lat[int(len(lat) * 0.95)] * 1e3, 2)
    print(f"[{label}] {json.dumps(out)}", flush=True)
    del index
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--dir", default="/tmp/isx_lifecycle_store")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--host-only", action="store_true")
    args = ap.parse_args()

    if not args.host_only:
        probe_tpu()
    results = {"rows": args.rows, "host_only": args.host_only}

    if not os.path.exists(os.path.join(args.dir, "manifest.json")):
        results["build_s"] = round(
            build_store(args.dir, args.rows, zeros=args.host_only), 1
        )
    disk = sum(
        os.path.getsize(os.path.join(args.dir, f)) for f in os.listdir(args.dir)
    )
    results["disk_gb"] = round(disk / 1e9, 2)

    results["restore_clean"] = restore(
        args.dir, args.rows, "restore_clean", host_only=args.host_only
    )

    # tombstone 1% (spread across the corpus), then restore again
    from image_search_tpu.index import EmbeddingStore

    store = EmbeddingStore(args.dir, DIM)
    dead = [f"/pictures/img_{i:08d}.jpg" for i in range(0, args.rows, 100)]
    t0 = time.monotonic()
    store.tombstone(dead)
    results["tombstone_1pct_s"] = round(time.monotonic() - t0, 2)
    del store
    results["restore_tombstoned"] = restore(
        args.dir, args.rows, "restore_tombstoned", host_only=args.host_only
    )

    store = EmbeddingStore(args.dir, DIM)
    t0 = time.monotonic()
    kept, dropped = store.compact()
    results["compact_s"] = round(time.monotonic() - t0, 1)
    results["compact_kept"] = kept
    results["compact_dropped"] = dropped
    del store
    results["restore_compacted"] = restore(
        args.dir, args.rows, "restore_compacted", host_only=args.host_only
    )

    out_path = os.path.join(
        os.path.dirname(__file__),
        "lifecycle_10m.host.json" if args.host_only else "lifecycle_10m.json",
    )
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))

    r = results
    print("\n| phase | time |")
    print("|---|---|")
    if "build_s" in r:
        print(f"| build {args.rows/1e6:.0f}M rows ({r['disk_gb']} GB) | {r['build_s']} s |")
    rc = r["restore_clean"]
    print(f"| store open (clean) | {rc['store_open_s']:.1f} s |")
    if args.host_only:
        print(f"| path read+decode (index-restore host half) | {rc['paths_decode_s']:.1f} s |")
    else:
        print(f"| int8 index re-upload | {rc['index_upload_s']:.1f} s |")
        print(f"| first query (incl. compile) | {rc['first_query_s']:.1f} s |")
        print(f"| steady query p50 / p95 | {rc['query_p50_ms']} / {rc['query_p95_ms']} ms |")
    rt = r["restore_tombstoned"]
    print(f"| tombstone 1% | {r['tombstone_1pct_s']} s |")
    print(f"| liveness pass (1% tombstoned) | {rt['liveness_s']:.1f} s |")
    if not args.host_only:
        print(f"| restore with tombstones (open+liveness+upload) | {rt['store_open_s']+rt['liveness_s']+rt['index_upload_s']:.1f} s |")
    print(f"| compact (drop 1%) | {r['compact_s']} s |")

    if not args.keep:
        shutil.rmtree(args.dir, ignore_errors=True)


if __name__ == "__main__":
    main()
