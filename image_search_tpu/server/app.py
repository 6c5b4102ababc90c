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


def build_app(engine: SearchEngine, static_dir: Optional[str] = None) -> web.Application:
    app = web.Application(client_max_size=16 * 1024 * 1024)
    app[ENGINE_KEY] = engine
    app[SCAN_LOCK_KEY] = asyncio.Lock()
    static_dir = static_dir or CLIENT_DIR

    async def search(request: web.Request) -> web.Response:
        from image_search_tpu.server.wire import SearchParams

        try:
            params = SearchParams.from_json(await request.json())
        except Exception:
            return web.json_response({"error": "invalid SearchParams"}, status=400)
        log.debug("Handle Search with params: %s", params)
        try:
            images = await asyncio.to_thread(
                engine.search, params.q, params.referenced_images
            )
        except Exception:
            log.exception("search failed")
            return web.Response(status=500)
        return web.json_response({"images": images})

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
            return web.json_response(
                {
                    "found": stats.found,
                    "embedded": stats.embedded,
                    "skipped_existing": stats.skipped_existing,
                    "decode_failures": stats.decode_failures,
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
    app = build_app(engine, args.static_dir)
    log.info("serving on http://%s:%d (media: %s)", args.addr, args.port, engine.media_dir)
    web.run_app(app, host=args.addr, port=args.port, print=None)


if __name__ == "__main__":
    main()
