#!/usr/bin/env python
"""Offline search CLI: query an index from the command line, no server.

    python tools/search.py "a dog on a beach" -m ~/Pictures \
        --index-dir ./index [-w models/clip.safetensors] [--k 10] \
        [--feedback media/img1.jpg --feedback media/img2.jpg]

Prints one JSON line per hit: {"rank", "score", "image_path", "id"}.
Flags are the server's (server/args.py) plus the query positional and
repeatable `--feedback` marks (the Rocchio
refinement the web client drives interactively — search.rs:60-67
weighting). Scripting/debugging counterpart of POST /search.
"""

from __future__ import annotations

import json
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

if os.environ.get("ISX_FORCE_CPU"):
    # CI path: must run before the first JAX op — the sandbox preimports
    # jax, so the env var alone is not enough (CLAUDE.md)
    import jax

    jax.config.update("jax_platforms", "cpu")


def main(argv=None) -> None:
    logging.basicConfig(level=os.environ.get("LOGLEVEL", "WARNING"))

    from image_search_tpu.server.args import ServerArgs, build_parser

    p = build_parser()
    p.prog = "search"
    p.add_argument("query", help="free-text query, or an image file path "
                   "with --image (query-by-image, like POST /search_image)")
    p.add_argument("--image", action="store_true",
                   help="treat the query as an image file path: embed it "
                        "with the vision tower and search by similarity")
    p.add_argument("--feedback", action="append", default=[],
                   help="marked image path (repeatable) for Rocchio refinement")
    ns = p.parse_args(argv)
    fb = ns.feedback
    query = ns.query
    base = {k: v for k, v in vars(ns).items() if k not in ("query", "feedback", "image")}
    args = ServerArgs(**base)

    from image_search_tpu.server.engine import SearchEngine

    engine = SearchEngine(args)
    if len(engine.index) == 0:
        print("index is empty — run tools/scan_dir.py or GET /scan first",
              file=sys.stderr)
        raise SystemExit(1)
    if ns.image:
        # --feedback works for image queries too: the image embedding rides
        # the same Rocchio fused path as a text one (POST /search_image?ref=)
        with open(query, "rb") as f:
            hits = engine.search_by_image(f.read(), referenced_images=fb)
    else:
        hits = engine.search(query, fb)
    for rank, img in enumerate(hits, start=1):
        print(json.dumps({"rank": rank, **img}))


if __name__ == "__main__":
    main()
