"""ctypes bindings for the native (C++) decoder.

Covers the reference's FULL extension whitelist natively (clip.rs:63-64):
JPEG/PNG (libjpeg/libpng), WebP (libwebp), TIFF (libtiff), GIF/BMP
(from-scratch decoders in native/codecs_extra.cpp) — no format drops to the
GIL-bound PIL path on a healthy build.

Loads ``_native_decoder.so`` (built by ``make -C native``) and exposes
``decode_bytes`` with the same contract as the PIL path in ``decode.py``.
ctypes foreign calls release the GIL, so the existing ThreadPoolExecutor
parallelizes decodes across cores exactly like the reference's rayon pool
(clip.rs:94-95). Falls back cleanly when the library isn't built.
"""

from __future__ import annotations

import ctypes
import logging
import os
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)

_LIB_NAME = "_native_decoder.so"

FMT_JPEG = 1
FMT_PNG = 2
FMT_WEBP = 3
FMT_GIF = 4
FMT_BMP = 5
FMT_TIFF = 6


def _load():
    candidates = [
        os.environ.get("IMAGE_SEARCH_TPU_DECODER", ""),
        os.path.join(os.path.dirname(__file__), _LIB_NAME),
    ]
    for path in candidates:
        if path and os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
                lib.isx_probe.restype = ctypes.c_int
                lib.isx_probe.argtypes = [
                    ctypes.c_char_p,
                    ctypes.c_size_t,
                    ctypes.c_int,
                    ctypes.POINTER(ctypes.c_int),
                    ctypes.POINTER(ctypes.c_int),
                ]
                lib.isx_decode.restype = ctypes.c_int
                lib.isx_decode.argtypes = [
                    ctypes.c_char_p,
                    ctypes.c_size_t,
                    ctypes.c_int,
                    ctypes.c_void_p,
                    ctypes.c_int,
                    ctypes.c_int,
                ]
                lib.isx_version.restype = ctypes.c_char_p
                log.info("native decoder loaded: %s", lib.isx_version().decode())
                return lib
            except OSError as err:
                log.warning("native decoder at %s failed to load: %s", path, err)
    return None


_lib = _load()


def available() -> bool:
    return _lib is not None


def decode_bytes(
    data: bytes, max_side: int = 0, max_pixels: int = 0
) -> Optional[np.ndarray]:
    """JPEG/PNG bytes -> uint8 RGB HWC array, or None if the native path
    can't handle them (caller falls back to PIL).

    max_side > 0 enables JPEG DCT-domain downscaling to the smallest 1/2^k
    scale whose longest edge is still >= max_side (PIL ``draft`` semantics).
    max_pixels > 0 rejects (returns None) any file whose decoded output
    would exceed that many pixels — enforced HERE, after the header-only
    probe and before the output buffer is allocated, so untrusted bytes
    whose header PIL cannot even parse still cannot trigger a
    decompression-bomb allocation (round-3 review).
    """
    if _lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    fmt = _lib.isx_probe(data, len(data), max_side, ctypes.byref(w), ctypes.byref(h))
    if fmt <= 0:
        return None
    if max_pixels and w.value * h.value > max_pixels:
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = _lib.isx_decode(
        data, len(data), max_side, out.ctypes.data_as(ctypes.c_void_p), w.value, h.value
    )
    if rc != 0:
        return None
    return out
