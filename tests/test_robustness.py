"""Cross-cutting robustness: HTTP-level scan||search concurrency, NaN debug
checks (SURVEY.md §5 race-detection row), and the stage timer."""

import asyncio
import os

import numpy as np
import pytest
from PIL import Image

from aiohttp.test_utils import TestClient, TestServer

import jax

from image_search_tpu.server.app import build_app
from image_search_tpu.server.args import ServerArgs
from image_search_tpu.server.engine import SearchEngine


def test_scan_and_search_concurrently(tmp_path):
    """A /search racing a long /scan must succeed (no donated-buffer crash,
    no event-loop starvation)."""
    media = str(tmp_path / "pics")
    os.makedirs(media)
    rng = np.random.default_rng(1)
    for i in range(24):
        Image.fromarray(rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)).save(
            f"{media}/{i}.jpg"
        )
    engine = SearchEngine(
        ServerArgs(
            model_weights=str(tmp_path / "none.st"),
            model="clip-tiny-test",
            media_dir=media,
            index_dir=str(tmp_path / "idx"),
            chunk_size=4,
            k=5,
        )
    )

    async def flow():
        app = build_app(engine)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            scan_task = asyncio.create_task(client.get("/scan"))
            # hammer /search while the scan is appending
            for _ in range(10):
                r = await client.post("/search", json={"q": "anything"})
                assert r.status == 200
                await asyncio.sleep(0.02)
            r = await scan_task
            assert r.status == 200
            stats = await r.json()
            assert stats["embedded"] == 24
            r = await client.post("/search", json={"q": "anything else"})
            assert len((await r.json())["images"]) == 5
        finally:
            await client.close()

    asyncio.new_event_loop().run_until_complete(flow())


def test_model_forward_with_nan_debugging(rng):
    """SURVEY §5: NaN debug checks enabled — a clean forward must not trip
    them (and they WOULD fire on hidden inf/nan intermediates)."""
    from image_search_tpu.config import tiny_test_config
    from image_search_tpu.models import clip as M, init_params

    cfg = tiny_test_config()
    params = init_params(jax.random.key(0), cfg)
    pixels = rng.normal(size=(2, 28, 28, 3)).astype(np.float32)
    ids = rng.integers(1, 126, size=(2, 16)).astype(np.int32)
    ids[:, -1] = cfg.text.eos_token_id
    jax.config.update("jax_debug_nans", True)
    try:
        img = M.encode_image(params, cfg, pixels, normalize=True)
        txt = M.encode_text(params, cfg, ids, normalize=True)
        assert np.isfinite(np.asarray(img)).all()
        assert np.isfinite(np.asarray(txt)).all()
    finally:
        jax.config.update("jax_debug_nans", False)


def test_stage_timer_report():
    import time

    from image_search_tpu.utils.profiling import StageTimer

    t = StageTimer()
    with t.stage("decode"):
        time.sleep(0.01)
    with t.stage("embed"):
        time.sleep(0.02)
    with t.stage("decode"):
        time.sleep(0.01)
    rep = t.report()
    assert "decode" in rep and "embed" in rep and "n=2" in rep
    assert t.totals["embed"] >= 0.02


def test_search_batcher_coalesces(tmp_path):
    """Micro-batcher: concurrent searches return the same results as the
    direct path, and at least one multi-query batch actually forms."""
    media = str(tmp_path / "pics")
    os.makedirs(media)
    rng = np.random.default_rng(2)
    for i in range(6):
        Image.fromarray(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)).save(
            f"{media}/{i}.jpg"
        )
    engine = SearchEngine(
        ServerArgs(
            model_weights=str(tmp_path / "none.st"),
            model="clip-tiny-test",
            media_dir=media,
            index_dir=str(tmp_path / "idx"),
            k=3,
        )
    )
    engine.scan()
    queries = [f"query number {i}" for i in range(8)]
    direct = {q: engine.search(q) for q in queries}

    async def flow():
        app = build_app(engine, batch_window_ms=25.0)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            async def one(q):
                r = await client.post("/search", json={"q": q})
                assert r.status == 200
                return q, (await r.json())["images"]

            results = await asyncio.gather(*[one(q) for q in queries])
            for q, images in results:
                # scores differ in the last float bits across batch shapes
                # (XLA reduction order); ranking must agree
                got = [i["image_path"] for i in images]
                want = [i["image_path"] for i in direct[q]]
                assert got == want, q
            # feedback searches ride the batcher too (one [B, m] sel_idx
            # row each) and must match the direct engine path
            marked = [direct[queries[0]][0]["image_path"]]
            direct_fb = engine.search(queries[0], referenced_images=marked)

            async def one_fb(q):
                r = await client.post(
                    "/search", json={"q": q, "referenced_images": marked}
                )
                assert r.status == 200
                return (await r.json())["images"]

            fb_results = await asyncio.gather(*[one_fb(queries[0]) for _ in range(6)])
            want_fb = [i["image_path"] for i in direct_fb]
            for images in fb_results:
                assert [i["image_path"] for i in images] == want_fb
        finally:
            await client.close()

    asyncio.new_event_loop().run_until_complete(flow())
    from image_search_tpu.utils.metrics import global_metrics

    # only genuinely coalesced (len>1) batches count: the 8 gathered
    # requests must have produced at least one multi-query batch
    counters = global_metrics.snapshot()["counters"]
    assert counters.get("batched_searches", 0) >= 2
    # the 6 concurrent feedback rounds must have coalesced too
    assert counters.get("batched_feedback_searches", 0) >= 2


def test_warm_serving_buckets_precompiles_and_matches(tmp_path):
    """Startup warmup: compiles the {8,16,32} serving buckets, sets the
    readiness gauge, and a subsequent all-plain search_many (which now rides
    the padded feedback program — empty selections degrade bitwise) ranks
    identically to the direct per-query path."""
    media = str(tmp_path / "pics")
    os.makedirs(media)
    rng = np.random.default_rng(5)
    for i in range(5):
        Image.fromarray(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)).save(
            f"{media}/{i}.jpg"
        )
    engine = SearchEngine(
        ServerArgs(
            model_weights=str(tmp_path / "none.st"),
            model="clip-tiny-test",
            media_dir=media,
            index_dir=str(tmp_path / "idx"),
            k=4,
        )
    )
    # empty index: warmup is a no-op but still flips the readiness gauge
    assert engine.warm_serving_buckets(32) == 0
    engine.scan()
    assert engine.warm_serving_buckets(32) == 3  # buckets 8, 16, 32
    from image_search_tpu.utils.metrics import global_metrics

    assert global_metrics.snapshot()["gauges"]["serving_warmup_done"] == 1.0

    queries = [f"warm check {i}" for i in range(3)]
    direct = [[r["image_path"] for r in engine.search(q)] for q in queries]
    batched = engine.search_many(queries)  # all-plain: feedback program path
    assert [[r["image_path"] for r in res] for res in batched] == direct
