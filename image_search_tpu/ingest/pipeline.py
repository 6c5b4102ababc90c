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
    thumb_cache=None,
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
    pool = DecodePool(workers=decode_workers, thumb_cache=thumb_cache)
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


# --------------------------------------------------------------------------
# multi-host scan under a GLOBAL mesh (SPMD)
#
# With a globally sharded index every process must issue an IDENTICAL
# sequence of jit programs (SPMD), so the per-host partitioned scan above
# (divergent call counts) is illegal — round 2 fell back to every host
# decoding the FULL corpus and letting dedup absorb the duplicates: N×
# wasted decode on the component that is already the bottleneck. The SPMD
# scan fixes that: hosts decode DISJOINT partitions while issuing identical
# programs, then every host applies the identical merged index add.


def plan_spmd_rounds(
    new_paths: Sequence[str], chunk_size: int, process_count: int
) -> List[List[List[str]]]:
    """Deterministic per-host round schedule for an SPMD scan.

    Returns ``plans[h][r]`` = host h's chunk for round r, such that:
    - partitions are disjoint and cover ``new_paths`` (crc32 hash, the same
      partition rule the process-local scan uses);
    - EVERY host has the same number of rounds (short partitions get empty
      trailing chunks), so per-round jit programs align across hosts.

    Every host computes the identical plan from the shared directory walk —
    so kept-path reconstruction after a round needs only a per-host decode
    success MASK, never a string exchange."""
    import zlib

    parts: List[List[str]] = [[] for _ in range(process_count)]
    for p in new_paths:
        parts[zlib.crc32(p.encode()) % process_count].append(p)
    rounds = max(
        ((len(x) + chunk_size - 1) // chunk_size for x in parts), default=0
    )
    return [
        [part[i * chunk_size : (i + 1) * chunk_size] for i in range(rounds)]
        for part in parts
    ]


class GlobalMeshComm:
    """Default round transport: embed + mask exchange for the SPMD scan.

    Single-process (the common case, and this sandbox): a plain local embed
    — the mesh shards the batch over local devices exactly like the
    process-local scan. Multi-process: every host contributes its local
    chunk as its shard of ONE global batch
    (``jax.make_array_from_process_local_data``), the embed is one SPMD
    program, and results + kept-masks are allgathered back to hosts so all
    of them can issue the identical index add."""

    def __init__(self, embedder):
        self.embedder = embedder

    def embed_round(self, images: List[np.ndarray], kept_mask: np.ndarray):
        import jax

        if jax.process_count() == 1:
            emb = self.embedder.embed_images(images)
            return kept_mask[None, :], emb
        return self._embed_round_multihost(images, kept_mask)

    def _embed_round_multihost(self, images, kept_mask):  # pragma: no cover
        # real-pod path; not executable in the single-process sandbox
        import jax
        import jax.numpy as jnp
        from jax.experimental import multihost_utils
        from jax.sharding import NamedSharding, PartitionSpec as P

        from image_search_tpu.ops.preprocess import pack_batch
        from image_search_tpu.parallel.mesh import DATA_AXIS

        emb_ = self.embedder
        mesh = emb_.mesh
        # hosts must agree on the pack-buffer bucket (local maxima differ)
        hb = max(im.shape[0] for im in images)
        wb = max(im.shape[1] for im in images)
        agreed = multihost_utils.process_allgather(np.array([hb, wb], np.int32))
        hb, wb = int(agreed[:, 0].max()), int(agreed[:, 1].max())
        padded = []
        for im in images:
            buf = np.zeros((hb, wb, 3), np.uint8)
            if im.ndim == 2:
                im = np.repeat(im[:, :, None], 3, axis=2)
            buf[: im.shape[0], : im.shape[1]] = im[:, :, :3]
            padded.append(buf)
        u8, A_h, A_w = pack_batch(
            padded, size=emb_.cfg.vision.image_size, mode=emb_.preprocess_mode
        )
        sharding = NamedSharding(mesh, P(DATA_AXIS))

        def globalize(a):
            return jax.make_array_from_process_local_data(
                NamedSharding(mesh, P(DATA_AXIS, *([None] * (a.ndim - 1)))), a
            )

        out = emb_._embed_u8(emb_.params, globalize(u8), globalize(A_h), globalize(A_w))
        all_emb = np.asarray(multihost_utils.process_allgather(out, tiled=True))
        all_masks = np.asarray(
            multihost_utils.process_allgather(kept_mask[None, :], tiled=True)
        )
        return all_masks, all_emb


def scan_directory_spmd(
    embedder,
    index: VectorIndex,
    media_dir: str,
    *,
    chunk_size: int = 500,
    decode_workers: int = 16,
    process_index: int = 0,
    process_count: int = 1,
    skip_paths=None,
    thumb_cache=None,
    comm=None,
    progress: Optional[Callable[[str], None]] = None,
    decode_log: Optional[List[str]] = None,
) -> ScanStats:
    """Multi-host scan with a GLOBALLY SHARDED index: disjoint per-host
    decode, identical per-round SPMD programs, identical index adds.

    Per round r every host: decodes ITS chunk ``plans[host][r]`` (other
    hosts' chunks are never touched — the decode duplication round 2
    shipped with is gone), embeds a fixed ``chunk_size``-slot batch (failed
    or absent slots hold zero images; identical program shape on every
    host), exchanges only the decode-success masks + embeddings via
    ``comm``, reconstructs every host's kept paths from the shared plan,
    and applies ONE identical merged ``index.add``. Decode of round r+1
    overlaps the embed of round r, like the process-local scan.

    ``decode_log`` (tests) collects the paths THIS host actually decoded.
    """
    t0 = time.monotonic()
    stats = ScanStats()
    skip = skip_paths or ()
    comm = comm or GlobalMeshComm(embedder)
    pool = DecodePool(workers=decode_workers, thumb_cache=thumb_cache)
    try:
        # identical walk on every host: deterministic shuffle seed
        all_paths = find_images(media_dir, shuffle=True, seed=0)
        stats.found = len(all_paths)
        new_paths = [
            p for p in all_paths if not index.has_path(p) and p not in skip
        ]
        stats.skipped_existing = stats.found - len(new_paths)
        plans = plan_spmd_rounds(new_paths, chunk_size, process_count)
        mine = plans[process_index]
        rounds = len(mine)
        if rounds == 0:
            stats.seconds = time.monotonic() - t0
            return stats
        log.info(
            "SPMD scan: host %d/%d decodes %d of %d new images over %d rounds",
            process_index,
            process_count,
            sum(len(c) for c in mine),
            len(new_paths),
            rounds,
        )

        zero_im = np.zeros((8, 8, 3), np.uint8)
        inflight = pool.submit_batch(mine[0])
        for r in range(rounds):
            chunk = mine[r]
            kept_paths, images = inflight.result()
            if r + 1 < rounds:
                inflight = pool.submit_batch(mine[r + 1])  # overlap decode
            if decode_log is not None:
                decode_log.extend(chunk)
            stats.decode_failures += len(chunk) - len(kept_paths)
            # fixed chunk_size slots: zero image where decode failed or the
            # chunk is short — every host runs the same program shape
            by_path = dict(zip(kept_paths, images))
            slots = [by_path.get(p, zero_im) for p in chunk]
            slots += [zero_im] * (chunk_size - len(slots))
            kept_mask = np.zeros((chunk_size,), bool)
            for i, p in enumerate(chunk):
                kept_mask[i] = p in by_path

            all_masks, all_emb = comm.embed_round(slots, kept_mask)
            all_emb = np.asarray(all_emb)
            add_paths: List[str] = []
            add_rows: List[np.ndarray] = []
            for h in range(process_count):
                for i, p in enumerate(plans[h][r]):
                    if all_masks[h][i]:
                        add_paths.append(p)
                        add_rows.append(all_emb[h * chunk_size + i])
            if add_paths:
                stats.embedded += index.add(add_paths, np.stack(add_rows))
            if progress:
                progress(f"round {r + 1}/{rounds}: {stats.embedded} embedded")

        stats.seconds = time.monotonic() - t0
        log.info(
            "SPMD scan complete: %d embedded, %d already present, %d decode "
            "failures, %.1fs",
            stats.embedded,
            stats.skipped_existing,
            stats.decode_failures,
            stats.seconds,
        )
        return stats
    finally:
        pool.close()
