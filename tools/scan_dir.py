#!/usr/bin/env python
"""Offline batch ingest: embed a photo directory into an index store
without starting the HTTP server.

    python tools/scan_dir.py -m ~/Pictures --index-dir ./index \
        [-w models/clip.safetensors] [--index-quantize int8] [--prune-on-scan]

Same flags as the server (server/args.py); `--addr/--port` are accepted and
ignored. The resulting index directory is what `image-search-tpu` serves —
run this from a cron job or a data pipeline, then (re)start the server, or
let a live server pick new rows up on its next `GET /scan` (dedup by path
makes both orders idempotent, mirroring the reference's dedup at
clip.rs:74-87 — its only batch-ingest entry point is the in-server
`embed_all_images_in_dir`, clip.rs:42).

Exit code 0 with a one-line JSON summary on stdout; decode failures are
logged + skipped per image, never fatal (clip.rs:96-105 semantics).
"""

from __future__ import annotations

import json
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

if os.environ.get("ISX_FORCE_CPU"):
    # CI/smoke path: must run before the first JAX op — the sandbox
    # preimports jax, so the env var alone is not enough (CLAUDE.md)
    import jax

    jax.config.update("jax_platforms", "cpu")


def main(argv=None) -> None:
    logging.basicConfig(
        level=os.environ.get("LOGLEVEL", "INFO"),
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )

    from image_search_tpu.server.args import parse_args
    from image_search_tpu.server.engine import SearchEngine

    import dataclasses

    args = parse_args(argv)
    engine = SearchEngine(args)
    stats = engine.scan()
    print(json.dumps(dataclasses.asdict(stats)))


if __name__ == "__main__":
    main()
