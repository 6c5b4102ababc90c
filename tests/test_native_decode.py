"""Native C++ decoder parity vs PIL, plus throughput sanity.

Skipped entirely when the .so isn't built (`make -C native`).
"""

import io
import os
import time

import numpy as np
import pytest
from PIL import Image

from image_search_tpu.ingest import native_decode

pytestmark = pytest.mark.skipif(
    not native_decode.available(), reason="native decoder not built"
)


def jpeg_bytes(arr, quality=90):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def png_bytes(arr, mode=None):
    im = Image.fromarray(arr) if mode is None else Image.fromarray(arr, mode)
    buf = io.BytesIO()
    im.save(buf, "PNG")
    return buf.getvalue()


def test_jpeg_matches_pil(rng):
    arr = rng.integers(0, 256, size=(123, 211, 3), dtype=np.uint8)
    data = jpeg_bytes(arr)
    want = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    got = native_decode.decode_bytes(data)
    assert got is not None and got.shape == want.shape
    # same bitstream, two IDCT implementations: tiny per-pixel differences
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 2


def test_jpeg_dct_scaling(rng):
    arr = rng.integers(0, 256, size=(1600, 1200, 3), dtype=np.uint8)
    data = jpeg_bytes(arr)
    got = native_decode.decode_bytes(data, max_side=512)
    # longest edge must stay >= 512 with the largest power-of-2 downscale: 1600/2=800
    assert got is not None and got.shape == (800, 600, 3)


def test_png_rgb_exact(rng):
    arr = rng.integers(0, 256, size=(64, 80, 3), dtype=np.uint8)
    got = native_decode.decode_bytes(png_bytes(arr))
    np.testing.assert_array_equal(got, arr)


def test_png_palette_gray_rgba(rng):
    gray = rng.integers(0, 256, size=(40, 40), dtype=np.uint8)
    got = native_decode.decode_bytes(png_bytes(gray, "L"))
    np.testing.assert_array_equal(got, np.repeat(gray[:, :, None], 3, axis=2))

    rgba = rng.integers(0, 256, size=(40, 40, 4), dtype=np.uint8)
    got = native_decode.decode_bytes(png_bytes(rgba, "RGBA"))
    np.testing.assert_array_equal(got, rgba[:, :, :3])


def test_garbage_returns_none():
    assert native_decode.decode_bytes(b"not an image") is None
    assert native_decode.decode_bytes(b"\xff\xd8\xff truncated jpeg!") is None
    assert native_decode.decode_bytes(b"\x89PNG\r\n\x1a\n broken") is None


def test_decode_image_uses_native(tmp_path, rng):
    from image_search_tpu.ingest.decode import decode_image

    arr = rng.integers(0, 256, size=(100, 100, 3), dtype=np.uint8)
    p = str(tmp_path / "x.jpg")
    Image.fromarray(arr).save(p, quality=95)
    out = decode_image(p)
    assert out is not None and out.shape == (100, 100, 3)


@pytest.mark.slow
def test_native_faster_than_pil(rng):
    arr = rng.integers(0, 256, size=(2000, 3000, 3), dtype=np.uint8)
    data = jpeg_bytes(arr)

    t0 = time.perf_counter()
    for _ in range(5):
        native_decode.decode_bytes(data, max_side=512)
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(5):
        im = Image.open(io.BytesIO(data))
        im.draft("RGB", (512, 512))
        np.asarray(im.convert("RGB"))
    t_pil = time.perf_counter() - t0
    # not a strict perf assertion (CI noise) — just ensure it's not slower
    assert t_native < t_pil * 1.5, (t_native, t_pil)


def _roundtrip(arr, fmt, tol, **save_kw):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, fmt, **save_kw)
    data = buf.getvalue()
    got = native_decode.decode_bytes(data, 0)
    assert got is not None, f"native decoder rejected {fmt}"
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert got.shape == pil.shape
    assert np.abs(got.astype(int) - pil.astype(int)).max() <= tol


def test_webp_matches_pil(rng):
    """clip.rs:63-64 whitelist: webp decodes natively (libwebp), matching
    PIL bit-for-bit (same underlying library)."""
    arr = rng.integers(0, 256, (48, 72, 3), dtype=np.uint8)
    _roundtrip(arr, "WEBP", 0, lossless=True)
    _roundtrip(arr, "WEBP", 24, quality=85)


def test_gif_matches_pil(rng):
    """From-scratch GIF-LZW decoder (no giflib in the image): plain and
    interlaced first frames match PIL's palette expansion exactly."""
    arr = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    _roundtrip(arr, "GIF", 0)
    _roundtrip(arr, "GIF", 0, interlace=True)


def test_bmp_matches_pil(rng):
    """From-scratch BMP decoder: 24-bit and 8-bit palette, bottom-up rows."""
    arr = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)  # odd stride pad
    _roundtrip(arr, "BMP", 0)
    buf = io.BytesIO()
    Image.fromarray(arr).convert("P").save(buf, "BMP")
    data = buf.getvalue()
    got = native_decode.decode_bytes(data, 0)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert got is not None and np.array_equal(got, pil)


def test_tiff_matches_pil(rng):
    """libtiff RGBA path (hand-declared stable ABI — no tiffio.h shipped)."""
    arr = rng.integers(0, 256, (52, 60, 3), dtype=np.uint8)
    _roundtrip(arr, "TIFF", 0)
    _roundtrip(arr, "TIFF", 0, compression="tiff_lzw")


def test_all_whitelisted_extensions_native(tmp_path, rng):
    """Every extension the reference accepts (clip.rs:63-64) decodes through
    the native path — none falls back to PIL."""
    from image_search_tpu.ingest.walk import IMAGE_EXTENSIONS

    arr = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    save_fmt = {"jpg": "JPEG", "jpeg": "JPEG", "png": "PNG", "gif": "GIF",
                "bmp": "BMP", "webp": "WEBP", "tiff": "TIFF"}
    assert set(save_fmt) == set(IMAGE_EXTENSIONS)
    for ext, fmt in save_fmt.items():
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, fmt)
        assert native_decode.decode_bytes(buf.getvalue(), 0) is not None, ext


def test_truncated_bitfields_bmp_rejected_not_overread():
    """A 54-65 byte BMP with compression=BI_BITFIELDS must be rejected by the
    header check, not read mask bytes past the buffer (round-2 review
    finding: masks live at offsets 54..65)."""
    import struct

    # minimal BITMAPINFOHEADER claiming 32bpp BI_BITFIELDS, file cut at 54B
    info = struct.pack(
        "<IiiHHIIiiII", 40, 4, 4, 1, 32, 3, 0, 2835, 2835, 0, 0
    )
    hdr = b"BM" + struct.pack("<IHHI", 54, 0, 0, 54) + info
    assert len(hdr) == 54
    assert native_decode.decode_bytes(hdr) is None  # rejected, no crash


def test_gif_huge_frame_dims_rejected():
    """A GIF whose screen passes the pixel cap but whose image descriptor
    claims a 65535x65535 frame must be rejected before the LZW buffer
    reserve (round-2 review finding: multi-GB bad_alloc across the C ABI)."""
    import struct

    gct = bytes(6)  # 2-entry global color table
    screen = struct.pack("<HHBBB", 4, 4, 0x80, 0, 0)  # gct present, 2 entries
    img = b"\x2c" + struct.pack("<HHHHB", 0, 0, 0xFFFF, 0xFFFF, 0)
    data = b"GIF89a" + screen + gct + img + b"\x02\x01\x00\x00" + b"\x3b"
    assert native_decode.decode_bytes(data) is None  # rejected, no crash


def test_fuzz_garbage_never_crashes(rng):
    """Random garbage and truncated real files must return None (PIL
    fallback handles them or the image is skipped) — never crash the
    process hosting the C decoder."""
    # pure noise with each magic prefix (routes into every parser)
    magics = [
        b"\xff\xd8\xff",  # JPEG
        b"\x89PNG\r\n\x1a\n",  # PNG
        b"RIFF\x20\x00\x00\x00WEBP",  # WebP
        b"GIF89a",  # GIF
        b"BM",  # BMP
        b"II*\x00",  # TIFF LE
        b"MM\x00*",  # TIFF BE
        b"",  # no magic at all
    ]
    for magic in magics:
        for size in (0, 1, 7, 64, 4096):
            blob = magic + rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
            # the contract is NO CRASH; random bytes behind a magic can in
            # principle form an accidentally-valid tiny image, so the
            # return value itself is unconstrained
            native_decode.decode_bytes(blob)

    # truncations of a real file at every boundary class
    arr = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    for maker in (jpeg_bytes, png_bytes):
        real = maker(arr)
        for cut in (2, 10, len(real) // 4, len(real) // 2, len(real) - 3):
            native_decode.decode_bytes(real[:cut])  # must not crash


def test_fuzz_structured_bmp_gif_headers(rng):
    """Structured fuzz of the two FROM-SCRATCH parsers: syntactically valid
    headers with random field values (dims, bpp, offsets, compression,
    palette sizes, LZW codes) must decode or cleanly reject — never crash
    or overread (run `make -C native fuzz && ./native/isx_fuzz` for the ASan
    memory-safety version)."""
    import struct

    for _ in range(300):
        # BMP: BM + random header fields + random tail
        vals = rng.integers(0, 2**31 - 1, size=10, dtype=np.int64)
        info = struct.pack(
            "<IiiHHIIiiII",
            int(rng.choice([40, 56, 108, 124])),  # header size variants
            int(vals[0] % 100000) - 50000,
            int(vals[1] % 100000) - 50000,
            1,
            int(rng.choice([0, 1, 4, 8, 16, 24, 32, 64])),
            int(rng.choice([0, 1, 2, 3, 6])),
            0, 2835, 2835,
            int(vals[2] % 1024),
            0,
        )
        tail = rng.integers(0, 256, size=int(vals[3] % 256), dtype=np.uint8).tobytes()
        blob = b"BM" + struct.pack("<IHHI", 54 + len(tail), 0, 0, int(vals[4] % 128)) + info + tail
        native_decode.decode_bytes(blob)

        # GIF: valid signature + random screen/descriptor/LZW stream
        screen = struct.pack(
            "<HHBBB", int(vals[5] % 512), int(vals[6] % 512),
            int(vals[7] % 256), 0, 0,
        )
        body = rng.integers(0, 256, size=int(vals[8] % 512), dtype=np.uint8).tobytes()
        native_decode.decode_bytes(b"GIF89a" + screen + body)
