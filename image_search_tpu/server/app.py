"""HTTP server: identical surface to the reference's axum router
(``/root/reference/server/src/main.rs:50-58``):

- ``POST /search`` — body ``{"q": str, "referenced_images": [str]}``
  (default []), response ``{"images": [{"id", "image_path"}]}``
  (``data/src/lib.rs:4-26``; we additionally surface the similarity score
  the reference computes but drops, ``main.rs:24-28``)
- ``GET /scan``   — runs the ingest and, like the reference
  (search.rs:108-118), only answers 200 when the scan completes
- ``GET /media/*`` — serves the raw photo directory
- SPA fallback    — serves the bundled web client

Unlike the reference, searches don't serialize behind DB/embedder mutexes
(main.rs:33-34, search.rs:26): model/index calls are microseconds-to-ms of
device work, executed via a small thread hop so the event loop stays free.
"""

from __future__ import annotations

import asyncio
import logging
import os
from typing import Optional

from aiohttp import web

from image_search_tpu.server.args import parse_args
from image_search_tpu.server.engine import SearchEngine

log = logging.getLogger(__name__)

CLIENT_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "client", "static")

ENGINE_KEY = web.AppKey("engine", SearchEngine)
SCAN_LOCK_KEY = web.AppKey("scan_lock", asyncio.Lock)


class SearchBatcher:
    """Coalesces concurrent searches — plain AND feedback — into one device
    program.

    Requests arriving within ``window_ms`` of the first are embedded and
    searched as ONE batch (engine.search_many): under concurrent load the
    text tower and the fused Rocchio/index program amortize across requests
    instead of serializing per query. Each request's referenced_images ride
    along as one padded selection row ([B, m] sel_idx in the fused program);
    an empty selection degrades to the plain text search bitwise.
    """

    def __init__(self, engine: SearchEngine, window_ms: float, max_batch: int = 32):
        self.engine = engine
        self.window = window_ms / 1e3
        self.max_batch = max_batch
        self._queue: asyncio.Queue = asyncio.Queue()
        self._task = None

    def start(self) -> None:
        self._task = asyncio.get_running_loop().create_task(self._run())

    async def stop(self) -> None:
        if self._task:
            self._task.cancel()
            try:
                await self._task
            except asyncio.CancelledError:
                pass
        # fail anything still queued so handlers awaiting submit() wake up
        while not self._queue.empty():
            *_, fut = self._queue.get_nowait()
            if not fut.done():
                fut.cancel()

    async def submit(self, query: str, referenced_images=()):
        fut = asyncio.get_running_loop().create_future()
        await self._queue.put((query, tuple(referenced_images), fut))
        return await fut

    async def _run(self) -> None:
        while True:
            first = await self._queue.get()
            batch = [first]
            loop = asyncio.get_running_loop()
            deadline = loop.time() + self.window
            while len(batch) < self.max_batch:
                timeout = deadline - loop.time()
                if timeout <= 0:
                    break
                try:
                    batch.append(
                        await asyncio.wait_for(self._queue.get(), timeout=timeout)
                    )
                except asyncio.TimeoutError:
                    break
            queries = [q for q, _, _ in batch]
            selections = [sel for _, sel, _ in batch]
            try:
                results = await asyncio.to_thread(
                    self.engine.search_many, queries, selections
                )
                for (_, _, f), res in zip(batch, results):
                    if not f.done():
                        f.set_result(res)
            except asyncio.CancelledError:
                # shutdown mid-batch: wake the waiting handlers, then exit
                for _, _, f in batch:
                    if not f.done():
                        f.cancel()
                raise
            except Exception as err:  # pragma: no cover - propagated per-request
                for _, _, f in batch:
                    if not f.done():
                        f.set_exception(err)


def build_app(
    engine: SearchEngine,
    static_dir: Optional[str] = None,
    batch_window_ms: float = 0.0,
) -> web.Application:
    app = web.Application(client_max_size=16 * 1024 * 1024)
    app[ENGINE_KEY] = engine
    app[SCAN_LOCK_KEY] = asyncio.Lock()
    static_dir = static_dir or CLIENT_DIR
    batcher = SearchBatcher(engine, batch_window_ms) if batch_window_ms > 0 else None

    def _spawn_warmup():
        # precompile the serving buckets off the request path: a cold
        # bucket otherwise pays its multi-second XLA compile inside the
        # first live request that hits it (measured: 3.2 s p99 stalls
        # in the first 32-client load-test rung). Background thread —
        # requests arriving mid-warmup just share the device as usual.
        if batcher is None:
            return

        def _warm():
            try:
                engine.warm_serving_buckets(batcher.max_batch)
            except Exception:
                log.exception("serving warmup failed (non-fatal)")

        import threading

        threading.Thread(target=_warm, name="serving-warmup", daemon=True).start()

    if batcher is not None:
        async def _start_batcher(app):
            batcher.start()
            _spawn_warmup()

        async def _stop_batcher(app):
            await batcher.stop()

        app.on_startup.append(_start_batcher)
        app.on_cleanup.append(_stop_batcher)

    async def search(request: web.Request) -> web.Response:
        from image_search_tpu.server.wire import SearchParams

        try:
            params = SearchParams.from_json(await request.json())
        except Exception:
            return web.json_response({"error": "invalid SearchParams"}, status=400)
        log.debug("Handle Search with params: %s", params)
        try:
            if batcher is not None:
                images = await batcher.submit(params.q, params.referenced_images)
            else:
                images = await asyncio.to_thread(
                    engine.search, params.q, params.referenced_images
                )
        except Exception:
            log.exception("search failed")
            return web.Response(status=500)
        # pre-rendered body (byte-identical to json.dumps): the per-request
        # escape of k=1000 id/path strings was 1.78 ms of the host budget
        return web.Response(
            body=engine.render_images_json(images),
            content_type="application/json",
        )

    async def search_image(request: web.Request) -> web.Response:
        """POST /search_image with raw image bytes -> {"images": [...]}.

        Query-by-image extension endpoint (no reference counterpart): the
        posted photo is decoded, embedded by the vision tower, and searched
        like a text query. Optional ``?k=`` overrides the result count;
        repeatable ``?ref=media/...`` params are marked results — the
        Rocchio feedback round then refines the IMAGE query exactly like
        /search refines a text one. 400 on undecodable bytes; body size is
        capped by the app's 16 MB client_max_size."""
        data = await request.read()
        if not data:
            return web.json_response({"error": "empty body"}, status=400)
        try:
            k = int(request.query.get("k", "0")) or None
        except ValueError:
            return web.json_response({"error": "bad k"}, status=400)
        refs = request.query.getall("ref", [])
        try:
            images = await asyncio.to_thread(engine.search_by_image, data, k, refs)
        except ValueError as err:
            return web.json_response({"error": str(err)}, status=400)
        except Exception:
            log.exception("image search failed")
            return web.Response(status=500)
        return web.Response(
            body=engine.render_images_json(images),
            content_type="application/json",
        )

    async def remove(request: web.Request) -> web.Response:
        """POST /remove {"images": ["media/...", ...]} -> {"removed": n}.

        Explicit durable deletion: tombstoned AND excluded from rescans, so
        the photo stays gone even while its file remains on disk (reclaim
        space later with tools/compact_store.py). Pass "restore": true to
        undo exclusions -> {"restored": n}; the next scan re-embeds the
        files. Extension endpoint — the reference has no deletion at all;
        selections resolve exactly like referenced_images in /search."""
        try:
            body = await request.json()
            images = list(body["images"])
            restore = bool(body.get("restore", False))
        except Exception:
            return web.json_response({"error": 'expected {"images": [...]}'}, status=400)
        if restore:
            n = await asyncio.to_thread(engine.restore_images, images)
            return web.json_response({"restored": n})
        n = await asyncio.to_thread(engine.remove_images, images)
        return web.json_response({"removed": n})

    dup_lock = asyncio.Lock()
    # the single in-flight-or-last-finished async duplicate-scan job:
    # {"id": str, "task": asyncio.Task, "threshold": float}
    dup_job: dict = {}

    def _dup_progress() -> float:
        from image_search_tpu.utils.metrics import global_metrics

        return global_metrics.snapshot()["gauges"].get("duplicate_scan_progress", 0.0)

    async def duplicates(request: web.Request) -> web.Response:
        """GET /duplicates[?threshold=0.95] -> {"groups": [["media/.."]]}.

        Extension endpoint: near-duplicate photo groups by embedding
        cosine (the reference has no counterpart). Single-flight like
        /scan: the O(corpus) batched self-scan must not run concurrently
        with itself (a double-click would double device load and stall
        interactive searches behind it).

        At 10M rows the self-scan is minutes of device time, so big
        corpora use the non-blocking job flow instead of holding an HTTP
        request open: ``GET /duplicates?async=1`` answers 202 with a job
        id immediately; poll ``GET /duplicates?job=<id>`` for 202
        ``{"state": "running", "progress": 0..1}`` until 200
        ``{"groups": ...}``. A second async request while one runs joins
        the running job (single-flight)."""
        job_id = request.query.get("job")
        if job_id is not None:
            if not dup_job or dup_job["id"] != job_id:
                return web.json_response({"error": "unknown job"}, status=404)
            task = dup_job["task"]
            if not task.done():
                return web.json_response(
                    {"job": job_id, "state": "running", "progress": _dup_progress()},
                    status=202,
                )
            # task.exception() RAISES CancelledError on a cancelled task
            # (server shutdown cancels in-flight jobs) — report it as a
            # failed job, don't 500 with a traceback
            if task.cancelled():
                return web.json_response(
                    {"job": job_id, "state": "failed"}, status=500
                )
            if task.exception() is not None:
                log.error("duplicate scan job failed", exc_info=task.exception())
                return web.json_response(
                    {"job": job_id, "state": "failed"}, status=500
                )
            return web.json_response(
                {
                    "job": job_id,
                    "state": "done",
                    "groups": task.result(),
                    # 'certified' = provably complete pair set;
                    # 'approximate'/'legacy_approx' may miss pairs (round-4
                    # verdict #3 — flat-corpus middle path)
                    "mode": engine.last_duplicate_mode,
                }
            )
        try:
            threshold = float(request.query.get("threshold", "0.95"))
        except ValueError:
            return web.json_response({"error": "bad threshold"}, status=400)
        if not (0.0 < threshold <= 1.0):
            return web.json_response({"error": "threshold must be in (0, 1]"}, status=400)
        if request.query.get("async") in ("1", "true"):
            if dup_job and not dup_job["task"].done():
                # single-flight join is only correct at the SAME threshold —
                # silently handing back a job computed at a different one
                # would answer the wrong question (round-3 review)
                if dup_job["threshold"] != threshold:
                    return web.json_response(
                        {
                            "error": "duplicate scan already running at "
                                     f"threshold {dup_job['threshold']}",
                            "job": dup_job["id"],
                            "threshold": dup_job["threshold"],
                        },
                        status=409,
                    )
                return web.json_response(
                    {
                        "job": dup_job["id"],
                        "state": "running",
                        "progress": _dup_progress(),
                    },
                    status=202,
                )
            import uuid

            async def run_job():
                async with dup_lock:
                    return await asyncio.to_thread(
                        engine.find_duplicate_groups, threshold
                    )

            task = asyncio.get_running_loop().create_task(run_job())
            # consume the exception of a never-polled failed job so it is
            # logged here, not as asyncio "exception was never retrieved"
            task.add_done_callback(
                lambda t: t.cancelled()
                or t.exception() is None
                or log.error("duplicate scan job failed", exc_info=t.exception())
            )
            job = {
                "id": uuid.uuid4().hex[:12],
                "task": task,
                "threshold": threshold,
            }
            dup_job.clear()
            dup_job.update(job)
            # the gauge still holds the PREVIOUS scan's final value (1.0)
            # until the worker thread starts — zero it now so a fresh job
            # never polls as "running, progress 1.0" (round-3 review)
            from image_search_tpu.utils.metrics import global_metrics

            global_metrics.gauge("duplicate_scan_progress", 0.0)
            return web.json_response(
                {
                    "job": job["id"],
                    "state": "running",
                    "poll": f"/duplicates?job={job['id']}",
                },
                status=202,
            )
        async with dup_lock:
            groups = await asyncio.to_thread(engine.find_duplicate_groups, threshold)
        return web.json_response(
            {"groups": groups, "mode": engine.last_duplicate_mode}
        )

    async def scan(request: web.Request) -> web.Response:
        # single-flight like the reference's awaited spawn (search.rs:108-118);
        # concurrent scans would double-decode the same files
        async with request.app[SCAN_LOCK_KEY]:
            try:
                stats = await asyncio.to_thread(engine.scan)
                log.info("embedded all images successfully.")
            except Exception:
                log.exception("Error embedding images")
                return web.Response(status=200)  # reference always returns 200
            if stats.embedded:
                # appends change the slab shapes the serving programs were
                # compiled for (and a server that STARTED empty skipped
                # warmup entirely) — re-warm off the request path; unchanged
                # shapes hit the jit cache and cost nothing
                _spawn_warmup()
            return web.json_response(
                {
                    "found": stats.found,
                    "embedded": stats.embedded,
                    "skipped_existing": stats.skipped_existing,
                    "decode_failures": stats.decode_failures,
                    "pruned": stats.pruned,
                    "seconds": round(stats.seconds, 3),
                }
            )

    async def index_html(request: web.Request) -> web.StreamResponse:
        return web.FileResponse(os.path.join(static_dir, "index.html"))

    async def metrics(request: web.Request) -> web.Response:
        from image_search_tpu.utils.metrics import global_metrics

        snap = global_metrics.snapshot()
        snap["gauges"]["corpus_size"] = float(len(engine.index))
        snap["model"] = engine.cfg.name
        return web.json_response(snap)

    async def health(request: web.Request) -> web.Response:
        return web.json_response(
            {"status": "ok", "model": engine.cfg.name, "corpus": len(engine.index)}
        )

    app.router.add_post("/search", search)
    app.router.add_post("/search_image", search_image)
    app.router.add_post("/remove", remove)
    app.router.add_get("/duplicates", duplicates)
    app.router.add_get("/scan", scan)
    app.router.add_get("/metrics", metrics)
    app.router.add_get("/health", health)
    app.router.add_get("/", index_html)
    if os.path.isdir(engine.media_dir):
        app.router.add_static("/media", engine.media_dir, follow_symlinks=True)
    if os.path.isdir(static_dir):
        app.router.add_static("/static", static_dir)

    async def spa_fallback(request: web.Request) -> web.StreamResponse:
        # axum fallback-to-index for client routes (main.rs:55-57)
        return web.FileResponse(os.path.join(static_dir, "index.html"))

    app.router.add_get("/{tail:.*}", spa_fallback)
    return app


def main(argv=None) -> None:
    logging.basicConfig(
        level=os.environ.get("LOG_LEVEL", "INFO"),
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    args = parse_args(argv)
    from image_search_tpu.utils.profiling import maybe_start_profiler

    maybe_start_profiler(args.profiler_port)
    engine = SearchEngine(args)
    app = build_app(engine, args.static_dir, batch_window_ms=args.batch_window_ms)
    log.info("serving on http://%s:%d (media: %s)", args.addr, args.port, engine.media_dir)
    web.run_app(app, host=args.addr, port=args.port, print=None)


if __name__ == "__main__":
    main()
