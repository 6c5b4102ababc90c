"""Host-side image decoding pool.

The TPU analogue of the reference's rayon ``par_iter`` decode stage
(``server/src/clip.rs:94-105``): a thread pool turns paths into uint8 HWC
arrays; all float work (resize/normalize) stays on-device
(``ops.preprocess``). PIL's codecs release the GIL, so threads scale.

JPEG fast-path: ``Image.draft`` does DCT-domain downscaling inside libjpeg
when the decoded image is much larger than the model input — decoding a
24 MP photo at 1/2..1/8 scale is several times cheaper and, because the
draft result is still >= 2x the final 224px target, the device bicubic
resample output is visually and numerically indistinguishable.

A C++ (libjpeg-turbo) decoder drop-in lives in ``native/``; this module
transparently uses it when built.
"""

from __future__ import annotations

import logging
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Sequence, Tuple

import numpy as np

log = logging.getLogger(__name__)

_DRAFT_TARGET = 512  # keep >= 2x the 224px model input for exact-enough bicubic


def decode_image(path: str, draft_target: int = _DRAFT_TARGET) -> Optional[np.ndarray]:
    """Decode one image to uint8 RGB HWC; None on failure (log-and-skip,
    mirroring clip.rs:96-105).

    JPEG/PNG go through the native C++ decoder when built (native/decoder.cpp,
    ~2-4x faster than PIL and GIL-free); everything else (GIF/BMP/WebP/TIFF)
    and any native failure falls back to PIL.
    """
    try:
        from image_search_tpu.ingest import native_decode

        if native_decode.available():
            with open(path, "rb") as f:
                data = f.read()
            arr = native_decode.decode_bytes(data, max_side=draft_target)
            if arr is not None:
                return arr
    except Exception as err:
        log.debug("native decode failed for %s (%s); falling back to PIL", path, err)
    try:
        from PIL import Image

        with Image.open(path) as im:
            if draft_target and im.format == "JPEG":
                im.draft("RGB", (draft_target, draft_target))
            im = im.convert("RGB")
            return np.asarray(im, dtype=np.uint8)
    except Exception as err:  # decoder errors are data-dependent; never fatal
        log.error("Failed to open image %s: %s", path, err)
        return None


# decoded-pixel cap for UNTRUSTED uploaded bytes (decode_image_bytes): a
# small crafted file can declare enormous dimensions (a 20k x 20k PNG body
# fits well under the 16 MB request cap but decodes to 1.2 GB); PIL's own
# bomb guard only trips near 178M pixels. 64M pixels ~ 0.19 GB decoded —
# far above any real photo a user would query with.
MAX_QUERY_PIXELS = 64_000_000


def decode_image_bytes(
    data: bytes, draft_target: int = _DRAFT_TARGET
) -> Optional[np.ndarray]:
    """Decode in-memory image bytes (e.g. an uploaded query image) to uint8
    RGB HWC; None on failure or when the declared dimensions exceed
    :data:`MAX_QUERY_PIXELS` (untrusted input — see the cap's comment).
    Same native-first/PIL-fallback policy as :func:`decode_image`."""
    try:
        import io

        from PIL import Image

        # header-only probe (no pixel decode) to enforce the cap BEFORE
        # either decoder allocates the output buffer
        with Image.open(io.BytesIO(data)) as im:
            w, h = im.size
        if w * h > MAX_QUERY_PIXELS:
            log.warning("rejecting %dx%d query image (> %d pixels)",
                        w, h, MAX_QUERY_PIXELS)
            return None
    except Exception:
        # unreadable header: let the decoders produce the real error — the
        # native path enforces the pixel cap itself via its own probe, so
        # a PIL-unparseable header cannot dodge the bomb guard
        pass
    try:
        from image_search_tpu.ingest import native_decode

        if native_decode.available():
            arr = native_decode.decode_bytes(
                data, max_side=draft_target, max_pixels=MAX_QUERY_PIXELS
            )
            if arr is not None:
                return arr
    except Exception as err:
        log.debug("native decode of %d bytes failed (%s); PIL fallback", len(data), err)
    try:
        import io

        from PIL import Image

        with Image.open(io.BytesIO(data)) as im:
            if draft_target and im.format == "JPEG":
                im.draft("RGB", (draft_target, draft_target))
            im = im.convert("RGB")
            return np.asarray(im, dtype=np.uint8)
    except Exception as err:
        log.error("Failed to decode %d uploaded bytes: %s", len(data), err)
        return None


class DecodePool:
    """Thread-pool batch decoder: paths -> (kept_paths, arrays).

    With a ``thumb_cache`` (ingest/thumbcache.py), every path is looked up
    in the persistent tile cache first; only misses pay a full decode, and
    the decoded tile is persisted so NO photo is ever fully decoded twice —
    across rescans, restarts, and model upgrades."""

    def __init__(
        self,
        workers: int = 16,
        draft_target: int = _DRAFT_TARGET,
        thumb_cache=None,
    ):
        self._pool = ThreadPoolExecutor(max_workers=workers, thread_name_prefix="decode")
        # batch orchestration runs on its OWN thread: submitting it to the
        # worker pool would deadlock at workers=1 (the orchestrator occupies
        # the only worker while its map() tasks queue behind it forever)
        self._batcher = ThreadPoolExecutor(max_workers=2, thread_name_prefix="decode-batch")
        self._draft = draft_target
        self._thumbs = thumb_cache

    def _decode_one(self, path: str) -> Optional[np.ndarray]:
        if self._thumbs is not None:
            tile = self._thumbs.get(path)
            if tile is not None:
                return tile
            arr = decode_image(path, self._draft)
            if arr is None:
                return None
            return self._thumbs.put(path, arr)
        return decode_image(path, self._draft)

    def decode_batch(self, paths: Sequence[str]) -> Tuple[List[str], List[np.ndarray]]:
        results = list(self._pool.map(self._decode_one, paths))
        kept_paths, images = [], []
        for path, arr in zip(paths, results):
            if arr is not None:
                kept_paths.append(path)
                images.append(arr)
        return kept_paths, images

    def submit_batch(self, paths: Sequence[str]):
        """Async variant: returns a future of decode_batch (for pipelining)."""
        return self._batcher.submit(self.decode_batch, paths)

    def close(self) -> None:
        self._batcher.shutdown(wait=False, cancel_futures=True)
        self._pool.shutdown(wait=False, cancel_futures=True)
