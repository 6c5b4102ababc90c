"""Offline store compaction: drop tombstoned rows, reclaim disk and HBM.

    python tools/compact_store.py --index-dir /data/index [--dim 768]

Run while the server is STOPPED (compaction must not race appends). After
restart the index restores without tombstone penalties and the dead rows'
device memory is reclaimed. Crash-safe: the atomic manifest swap is the
single commit point (see EmbeddingStore.compact).

No reference counterpart: the reference can neither delete nor compact
(its SurrealDB rows are append-only from the app's perspective).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--index-dir", required=True)
    ap.add_argument(
        "--dim", type=int, default=None,
        help="embedding dim (default: read from the manifest)",
    )
    args = ap.parse_args(argv)

    # Host-side IO tool: must never touch the TPU. JAX_PLATFORMS=cpu in the
    # environment is NOT enough here — the sandbox preimports jax before the
    # env var is read (CLAUDE.md), so force the platform via config.
    import jax

    jax.config.update("jax_platforms", "cpu")

    from image_search_tpu.index.store import EmbeddingStore

    dim = args.dim
    if dim is None:
        with open(os.path.join(args.index_dir, EmbeddingStore.MANIFEST)) as f:
            dim = json.load(f)["dim"]
    store = EmbeddingStore(args.index_dir, dim)
    kept, dropped = store.compact()
    print(f"compacted {args.index_dir}: {kept} rows kept, {dropped} dropped")


if __name__ == "__main__":
    main()
