"""Concurrent-search load test (VERDICT round-1 item 8).

Demonstrates the no-mutex-serialization win over the reference: its searches
serialize behind the embedder + DB mutexes (``main.rs:33-34``,
``search.rs:26``), so p95 grows linearly with client count. Here the text
tower batches and the index program coalesces (``--batch-window-ms``), so
added concurrency amortizes instead of queueing.

Spawns a real server over a synthetic corpus (embeddings pre-seeded straight
into the EmbeddingStore — no decode needed), then fires mixed plain/feedback
search ladders at 1/8/32 concurrent clients and reports client-side
p50/p95/p99 plus the server's coalescing counters.

Run (defaults: 20k rows, tiny model on CPU hosts / ViT-L on TPU):
    python benchmarks/load_test.py [--rows 100000] [--model clip-vit-large-patch14]
        [--port 3741] [--batch-window-ms 5] [--feedback-fraction 0.5]
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import subprocess
import sys
import tempfile
import time
import urllib.request

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def seed_store(index_dir: str, media_dir: str, rows: int, dim: int) -> list:
    sys.path.insert(0, REPO)
    from image_search_tpu.index.store import EmbeddingStore

    store = EmbeddingStore(index_dir, dim)
    rng = np.random.default_rng(0)
    paths = []
    chunk = 10_000
    for lo in range(0, rows, chunk):
        n = min(chunk, rows - lo)
        batch = [os.path.join(media_dir, f"img_{lo + i:07d}.jpg") for i in range(n)]
        store.append(batch, rng.normal(size=(n, dim)).astype(np.float32))
        paths.extend(batch[:: max(1, n // 4)])  # keep a few for feedback marks
    return paths


async def run_ladder(url: str, clients: int, requests: int, feedback_fraction: float,
                     media_paths: list):
    import aiohttp

    rng = np.random.default_rng(clients)
    requests = max(requests, clients * 10)
    queries = [f"a photo of concept {i % 37}" for i in range(requests)]
    lat = []

    async def worker(session, idxs):
        for i in idxs:
            body = {"q": queries[i], "referenced_images": []}
            if rng.random() < feedback_fraction:
                k = int(rng.integers(1, 4))
                body["referenced_images"] = [
                    "media/" + os.path.basename(media_paths[int(rng.integers(len(media_paths)))])
                    for _ in range(k)
                ]
            t0 = time.perf_counter()
            async with session.post(url + "/search", json=body) as r:
                assert r.status == 200, (r.status, await r.text())
                await r.json()
            lat.append((time.perf_counter() - t0) * 1e3)

    async with aiohttp.ClientSession() as session:
        shards = [list(range(c, requests, clients)) for c in range(clients)]
        # two untimed pre-passes with the same concurrency pattern: batch
        # sizes depend on arrival timing, so one pass can miss a pow2
        # batch-bucket jit variant the timed pass then compiles (seconds
        # through the remote-compile service, not a steady-state cost)
        await asyncio.gather(*[worker(session, s) for s in shards])
        await asyncio.gather(*[worker(session, s) for s in shards])
        lat.clear()
        t0 = time.perf_counter()
        await asyncio.gather(*[worker(session, s) for s in shards])
        wall = time.perf_counter() - t0
    arr = np.asarray(lat)
    return {
        "clients": clients,
        "requests": len(arr),
        "throughput_rps": round(len(arr) / wall, 1),
        "p50_ms": round(float(np.percentile(arr, 50)), 1),
        "p95_ms": round(float(np.percentile(arr, 95)), 1),
        "p99_ms": round(float(np.percentile(arr, 99)), 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000)
    ap.add_argument("--model", default="clip-tiny-test")
    ap.add_argument("--port", type=int, default=3741)
    ap.add_argument("--batch-window-ms", type=float, default=5.0)
    ap.add_argument("--feedback-fraction", type=float, default=0.5)
    ap.add_argument("--requests", type=int, default=160)
    ap.add_argument("--ladder", default="1,8,32")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from image_search_tpu.config import get_config

    dim = get_config(args.model).projection_dim
    tmp = tempfile.mkdtemp(prefix="loadtest_")
    media_dir = os.path.join(tmp, "media")
    index_dir = os.path.join(tmp, "index")
    os.makedirs(media_dir)
    print(f"seeding {args.rows} synthetic rows (dim {dim})...", file=sys.stderr)
    media_paths = seed_store(index_dir, media_dir, args.rows, dim)

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    srv = subprocess.Popen(
        [sys.executable, "-m", "image_search_tpu.server.app",
         "--media-dir", media_dir, "--index-dir", index_dir,
         "--model", args.model, "--model-weights", os.path.join(tmp, "none.st"),
         "--addr", "127.0.0.1", "--port", str(args.port),
         "--batch-window-ms", str(args.batch_window_ms)],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    url = f"http://127.0.0.1:{args.port}"
    try:
        deadline = time.time() + 600
        while time.time() < deadline:
            try:
                with urllib.request.urlopen(url + "/health", timeout=2) as r:
                    if r.status == 200:
                        break
            except Exception:
                time.sleep(2)
        else:
            raise RuntimeError("server did not come up")
        # wait (bounded) for the serving-bucket precompile so the ladder
        # measures steady state, not first-hit XLA compiles
        deadline = time.time() + 300
        while time.time() < deadline:
            try:
                with urllib.request.urlopen(url + "/metrics", timeout=5) as r:
                    if json.load(r)["gauges"].get("serving_warmup_done"):
                        break
            except Exception:
                pass
            time.sleep(2)
        for clients in [int(c) for c in args.ladder.split(",")]:
            row = asyncio.run(run_ladder(url, clients, args.requests,
                                         args.feedback_fraction, media_paths))
            print(json.dumps(row))
        with urllib.request.urlopen(url + "/metrics", timeout=10) as r:
            metrics = json.load(r)
        counters = metrics["counters"]
        print(json.dumps({"coalescing_counters": {
            k: v for k, v in counters.items() if "batch" in k or "feedback" in k}}))
        # server-side stage percentiles: discriminates device-side stalls
        # (index_search/text_embed p99 spikes) from client/event-loop
        # contention (client p99 spikes while server stages stay flat)
        print(json.dumps({"server_timers": metrics.get("latencies", {})}))
    finally:
        srv.terminate()
        srv.wait(timeout=30)


if __name__ == "__main__":
    main()
