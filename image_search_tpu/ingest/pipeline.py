"""The scan/ingest pipeline: walk -> dedup -> decode -> embed -> index.

TPU-first re-design of ``embed_all_images_in_dir``
(``/root/reference/server/src/clip.rs:42-151``). Same observable behavior
(idempotent re-scan via path dedup, per-image skip on decode failure, chunked
progress logging), different machinery:

- the reference loads the model and reconnects to the DB **inside every
  scan** (clip.rs:45-48); here the embedder is compiled once and the index is
  already resident;
- the reference decodes a whole chunk, then does one blocking GPU forward
  (clip.rs:94-118). Here decode of chunk N+1 overlaps device compute of
  chunk N: the embed dispatch is async (JAX), and the next decode batch is
  already running on the pool — a software double-buffer;
- embeddings land in the device index AND the on-disk store as each chunk
  completes, so an interrupted scan resumes at the last chunk (the
  reference gets this from the DB; we get it from the shard manifest).
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Callable, List, Optional, Sequence

import numpy as np

from image_search_tpu.index.index import VectorIndex
from image_search_tpu.ingest.decode import DecodePool
from image_search_tpu.ingest.walk import find_images

log = logging.getLogger(__name__)


@dataclasses.dataclass
class ScanStats:
    found: int = 0
    skipped_existing: int = 0
    decode_failures: int = 0
    embedded: int = 0
    seconds: float = 0.0
    pruned: int = 0  # images tombstoned by --prune-on-scan

    @property
    def images_per_sec(self) -> float:
        return self.embedded / self.seconds if self.seconds > 0 else 0.0


def scan_directory(
    embedder,
    index: VectorIndex,
    media_dir: str,
    chunk_size: int = 500,
    decode_workers: int = 16,
    shuffle: bool = True,
    seed: Optional[int] = None,
    progress: Optional[Callable[[str], None]] = None,
    process_index: int = 0,
    process_count: int = 1,
    skip_paths=None,
) -> ScanStats:
    """Embed every new image under ``media_dir`` into ``index``.

    chunk_size defaults to 500 to match ``--chunk-size``
    (server_arguments.rs:12-13).

    Multi-host ingest: with ``process_count > 1`` (e.g.
    ``jax.process_index()/process_count()`` on a pod), each process claims a
    deterministic hash partition of the paths, so hosts decode disjoint
    subsets while their chips cooperate in the data-parallel embed — the
    per-chip host-feeding component from SURVEY.md §2.4.
    """
    t0 = time.monotonic()
    stats = ScanStats()
    pool = DecodePool(workers=decode_workers)
    try:
        all_paths = find_images(media_dir, shuffle=shuffle, seed=seed)
        if process_count > 1:
            import zlib

            all_paths = [
                p for p in all_paths
                if zlib.crc32(p.encode()) % process_count == process_index
            ]
        stats.found = len(all_paths)

        # dedup before decode (clip.rs:74-87): only new paths cost anything;
        # skip_paths = explicitly removed images (POST /remove) that must
        # not be resurrected while their files remain on disk
        skip = skip_paths or ()
        new_paths = [
            p for p in all_paths if not index.has_path(p) and p not in skip
        ]
        stats.skipped_existing = stats.found - len(new_paths)
        log.info(
            "Found %d images of which %d are new", stats.found, len(new_paths)
        )

        chunks = [
            new_paths[i : i + chunk_size] for i in range(0, len(new_paths), chunk_size)
        ]
        if not chunks:
            stats.seconds = time.monotonic() - t0
            return stats

        # prime the pipeline: decode chunk 0
        inflight = pool.submit_batch(chunks[0])
        pending: List = []  # [(paths, device_embeddings)]
        for ci in range(len(chunks)):
            kept_paths, images = inflight.result()
            stats.decode_failures += len(chunks[ci]) - len(kept_paths)
            if ci + 1 < len(chunks):
                inflight = pool.submit_batch(chunks[ci + 1])  # overlap decode
            if not kept_paths:
                continue
            # async dispatch: returns immediately, device crunches in background
            emb_dev = embedder.embed_images_async(images)
            pending.append((kept_paths, emb_dev))

            # drain the previous chunk's result (it has had a full decode
            # round to finish) so memory stays bounded at ~2 chunks
            if len(pending) > 1:
                done_paths, done_emb = pending.pop(0)
                _flush(index, done_paths, done_emb, stats)
            if progress:
                progress(f"chunk {ci + 1}/{len(chunks)}: {stats.embedded} embedded")

        for done_paths, done_emb in pending:
            _flush(index, done_paths, done_emb, stats)

        stats.seconds = time.monotonic() - t0
        log.info(
            "Scan complete: %d embedded, %d already present, %d decode failures, %.1fs (%.1f img/s)",
            stats.embedded,
            stats.skipped_existing,
            stats.decode_failures,
            stats.seconds,
            stats.images_per_sec,
        )
        return stats
    finally:
        pool.close()


def _flush(index: VectorIndex, paths: Sequence[str], emb_dev, stats: ScanStats) -> None:
    emb = np.asarray(emb_dev)[: len(paths)]  # drop batch-bucket padding
    stats.embedded += index.add(paths, emb)
