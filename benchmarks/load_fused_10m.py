#!/usr/bin/env python
"""Concurrent-search throughput at 10M rows through the FUSED serving path.

Round 3 measured the no-mutex-serialization win (5.5x 1-client
throughput at 32 clients) on a 100k corpus BEFORE the fused one-program
path existed. This harness re-measures at the advertised 10M scale on
the exact serving stack latency_decomp.py decomposes — same
device-generated corpus (benchmarks/synth_corpus.py), same engine —
with the SearchBatcher coalescing concurrent requests into batched
fused/full-scan programs:

  ladder: 1 / 8 / 32 concurrent clients x distinct cold queries
  reported per rung: q/s, client p50/p95/p99, coalescing counters

Routing under load: batches <= --twostage-max-batch run the certified
fused two-stage program; bigger coalesced batches route to the batched
full scan (which amortizes better past the certification frontier —
RESULTS.md two-stage table). Both are exercised here; the counters say
how often each fired.

Loopback aiohttp (TestServer) — no real sockets, so the numbers isolate
the serving stack + device, not the sandbox tunnel's HTTP proxying. The
tunnel still sits inside every device round trip; q/s at depth is
therefore a LOWER bound (in-flight requests pipeline across it).

ISX_CPU_SMOKE=1 runs 64k rows on CPU (harness wiring only).
ONE process, serialized (tunnel discipline, CLAUDE.md).
Run: python benchmarks/load_fused_10m.py [--rows 10000000]
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMOKE = bool(os.environ.get("ISX_CPU_SMOKE"))
OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "load_fused_10m.smoke.json" if SMOKE else "load_fused_10m.json",
)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def pct(xs, q):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(q * len(xs)))]


async def ladder(app_client, clients: int, total: int, tag: str):
    from synth_corpus import QUERIES

    queries = [f"{tag} {i} {QUERIES[i % len(QUERIES)]}" for i in range(total)]
    lat = []
    next_i = 0

    async def worker():
        nonlocal next_i
        while True:
            i = next_i
            if i >= total:
                return
            next_i += 1
            t0 = time.perf_counter()
            r = await app_client.post("/search", json={"q": queries[i]})
            body = await r.read()
            assert r.status == 200 and len(body) > 500, (r.status, len(body))
            lat.append(time.perf_counter() - t0)

    t0 = time.perf_counter()
    await asyncio.gather(*[worker() for _ in range(clients)])
    wall = time.perf_counter() - t0
    return {
        "clients": clients,
        "requests": total,
        "qps": round(total / wall, 1),
        "p50_ms": round(pct(lat, 0.50) * 1e3, 1),
        "p95_ms": round(pct(lat, 0.95) * 1e3, 1),
        "p99_ms": round(pct(lat, 0.99) * 1e3, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--k", type=int, default=1000)
    ap.add_argument("--sketch-dtype", default="bfloat16")
    ap.add_argument("--batch-window-ms", type=float, default=5.0)
    ap.add_argument("--requests", type=int, default=200)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
        args.rows = min(args.rows, 64_000)
        args.requests = 24
    else:
        assert jax.default_backend() == "tpu"
        probe = jnp.ones((8, 8), jnp.bfloat16)
        float((probe @ probe)[0, 0])
        log("[probe] ok")

    from synth_corpus import build_engine

    engine, *_ = build_engine(args.rows, args.k, args.sketch_dtype)

    from aiohttp.test_utils import TestClient, TestServer

    from image_search_tpu.server.app import build_app
    from image_search_tpu.utils.metrics import global_metrics

    app = build_app(engine, batch_window_ms=args.batch_window_ms)
    results = {
        "rows": args.rows,
        "k": args.k,
        "sketch_dtype": args.sketch_dtype,
        "batch_window_ms": args.batch_window_ms,
        "ladder": [],
    }

    async def scan_concurrent_rung(c, clients: int):
        """Search tails while a REAL /scan ingests on the same chip.

        The reference serializes every search behind its embedder/DB
        mutexes and /scan blocks the server until the full directory is
        embedded (main.rs:33-34, search.rs:26,108-118) — a search issued
        mid-scan waits for the WHOLE scan. Here the scan's decode pool,
        vision forwards, index appends, and incremental sketch updates
        share the device with live queries; this rung measures what that
        contention does to search tails. Anything p99 << scan_seconds
        beats the reference qualitatively.
        """
        import shutil

        from synth_corpus import QUERIES

        rng = np.random.default_rng(11)
        base = "/tmp/isx_load_scan"
        dirs = {"warm": 16 if SMOKE else 500, "main": 48 if SMOKE else 8000}
        for name, count in dirs.items():
            d = os.path.join(base, name)
            if os.path.isdir(d) and len(os.listdir(d)) == count:
                continue  # reuse across runs (generation is untimed anyway)
            shutil.rmtree(d, ignore_errors=True)
            os.makedirs(d)
            from PIL import Image

            for i in range(count):
                Image.fromarray(
                    rng.integers(0, 255, (224, 224, 3), np.uint8)
                ).save(os.path.join(d, f"scan_{name}_{i:06d}.jpg"), quality=85)
        log(f"[scan-rung] media dirs ready {dirs}")

        eng = app[_engine_key()]
        # warm scan: compiles the embed bucket shapes + the post-scan
        # sketch rebuild OUTSIDE the timed window (chunks are full-sized in
        # both dirs, so the main scan replays only cached programs)
        eng.media_dir = eng.args.media_dir = os.path.join(base, "warm")
        r = await c.get("/scan")
        warm_stats = json.loads(await r.read())
        log(f"[scan-rung] warm scan {warm_stats}")

        eng.media_dir = eng.args.media_dir = os.path.join(base, "main")
        lat = []
        issued = 0
        cap = 60 if SMOKE else 4000
        t0 = time.perf_counter()
        scan_task = asyncio.ensure_future(c.get("/scan"))
        await asyncio.sleep(0.05)  # let the scan enter the handler

        async def worker(wid):
            nonlocal issued
            while not scan_task.done() and issued < cap:
                i = issued
                issued += 1
                q = f"scanload {wid} {i} {QUERIES[i % len(QUERIES)]}"
                tq = time.perf_counter()
                r = await c.post("/search", json={"q": q})
                body = await r.read()
                assert r.status == 200 and len(body) > 500, (r.status, len(body))
                lat.append(time.perf_counter() - tq)

        await asyncio.gather(*[worker(w) for w in range(clients)])
        searched_window = time.perf_counter() - t0
        scan_resp = await scan_task
        scan_stats = json.loads(await scan_resp.read())
        scan_wall = time.perf_counter() - t0
        wall = searched_window  # queries only ran inside this window
        return {
            "clients": clients,
            "requests": len(lat),
            "qps_during_scan": round(len(lat) / wall, 1),
            "p50_ms": round(pct(lat, 0.50) * 1e3, 1),
            "p95_ms": round(pct(lat, 0.95) * 1e3, 1),
            "p99_ms": round(pct(lat, 0.99) * 1e3, 1),
            "max_ms": round(max(lat) * 1e3, 1),
            "scan": scan_stats,
            "scan_warm": warm_stats,
            "scan_wall_s": round(scan_wall, 2),
            "search_window_s": round(searched_window, 2),
            "overlap_frac": round(min(searched_window, scan_wall) / scan_wall, 3),
        }

    def _engine_key():
        from image_search_tpu.server.app import ENGINE_KEY

        return ENGINE_KEY

    async def drive():
        c = TestClient(TestServer(app))
        await c.start_server()
        try:
            # warm every batch bucket the ladder can hit (compile is
            # one-time per shape; minutes over the tunnel must not land
            # inside a timed rung)
            log("[warm] batch buckets")
            for conc in (1, 2, 4, 8, 16, 32):
                await asyncio.gather(*[
                    c.post("/search", json={"q": f"warm {conc} {j}"})
                    for j in range(conc)
                ])
            for conc in (1, 8, 32):
                row = await ladder(c, conc, args.requests, f"load{conc}")
                results["ladder"].append(row)
                log(f"[ladder] {row}")
                with open(OUT, "w") as f:
                    json.dump(results, f, indent=1)
            # anti-thesis rung: tails under simultaneous ingest
            results["scan_concurrent"] = await scan_concurrent_rung(c, 32)
            log(f"[scan-rung] {results['scan_concurrent']}")
            with open(OUT, "w") as f:
                json.dump(results, f, indent=1)
        finally:
            await c.close()

    asyncio.new_event_loop().run_until_complete(drive())
    snap = global_metrics.snapshot()["counters"]
    results["counters"] = {
        k: v for k, v in snap.items()
        if "search" in k or "batch" in k or "fused" in k or "fallback" in k
    }
    base = results["ladder"][0]["qps"]
    results["speedup_32_vs_1"] = round(results["ladder"][-1]["qps"] / base, 2)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    sys.stdout.flush()
    sys.stderr.flush()
    # hard-exit: the engine's decode pool + batcher threads trip a C++
    # abort in the axon plugin during normal interpreter teardown
    # (measured rc=-6 AFTER all results were written, round 5) — results
    # are on disk, skip teardown
    os._exit(0)


if __name__ == "__main__":
    main()
