"""Ingest pipeline: walker filter semantics (clip.rs:59-68), decode
skip-and-log (clip.rs:96-105), idempotent re-scan (clip.rs:74-87), and the
double-buffered scan loop end-to-end with a tiny model.
"""

import os

import numpy as np
import pytest
from PIL import Image

import jax

from image_search_tpu.config import tiny_test_config
from image_search_tpu.index import EmbeddingStore, VectorIndex
from image_search_tpu.ingest import DecodePool, decode_image, find_images, scan_directory
from image_search_tpu.ingest.walk import is_image_path
from image_search_tpu.models import init_params
from image_search_tpu.models.embedder import ClipEmbedder


def make_corpus(root, n=12, start=0):
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(start)
    paths = []
    for i in range(start, start + n):
        arr = rng.integers(0, 256, size=(40 + i, 50, 3), dtype=np.uint8)
        p = os.path.join(root, f"img_{i:03d}.png" if i % 2 else f"img_{i:03d}.jpg")
        Image.fromarray(arr).save(p)
        paths.append(p)
    return paths


@pytest.fixture(scope="module")
def embedder():
    cfg = tiny_test_config()
    params = init_params(jax.random.key(0), cfg)
    return ClipEmbedder(params, cfg)


def test_extension_filter():
    """Mirror of the reference's own test_matches (clip.rs:176-234)."""
    assert not is_image_path("file.txt")
    assert is_image_path("file.jpg")
    assert is_image_path("file.PNG")
    assert not is_image_path("file.mp4")
    assert not is_image_path("file")
    assert is_image_path("photo.JPeG")
    assert not is_image_path(".jpg_not_ext")


def test_find_images_walks_and_filters(tmp_path):
    make_corpus(str(tmp_path / "a"), 4)
    make_corpus(str(tmp_path / "a" / "nested"), 3)
    (tmp_path / "a" / "notes.txt").write_text("x")
    (tmp_path / "a" / "clip.mp4").write_bytes(b"x")
    found = find_images(str(tmp_path / "a"), shuffle=False)
    assert len(found) == 7
    assert all(p.endswith((".png", ".jpg")) for p in found)


def test_find_images_shuffles_deterministically(tmp_path):
    make_corpus(str(tmp_path), 10)
    a = find_images(str(tmp_path), shuffle=True, seed=42)
    b = find_images(str(tmp_path), shuffle=True, seed=42)
    c = find_images(str(tmp_path), shuffle=False)
    assert a == b
    assert sorted(a) == sorted(c)


def test_decode_failure_skipped(tmp_path, caplog):
    good = make_corpus(str(tmp_path), 2)
    bad = str(tmp_path / "broken.jpg")
    with open(bad, "wb") as f:
        f.write(b"not a jpeg at all")
    assert decode_image(bad) is None
    pool = DecodePool(workers=2)
    kept, images = pool.decode_batch(good + [bad])
    pool.close()
    assert kept == good
    assert len(images) == 2


def test_scan_end_to_end(tmp_path, embedder):
    media = str(tmp_path / "pics")
    make_corpus(media, 9)
    store = EmbeddingStore(str(tmp_path / "idx"), embedder.cfg.projection_dim)
    index = VectorIndex(embedder.cfg.projection_dim, store=store)

    stats = scan_directory(embedder, index, media, chunk_size=4)
    assert stats.found == 9
    assert stats.embedded == 9
    assert stats.decode_failures == 0
    assert len(index) == 9

    # re-scan is a no-op (idempotency via dedup)
    stats2 = scan_directory(embedder, index, media, chunk_size=4)
    assert stats2.embedded == 0
    assert stats2.skipped_existing == 9

    # new photos appear, old ones are skipped
    make_corpus(media, 3, start=100)
    stats3 = scan_directory(embedder, index, media, chunk_size=4)
    assert stats3.embedded == 3
    assert len(index) == 12


def test_scan_resume_from_store(tmp_path, embedder):
    """Interrupted-ingest recovery: a fresh process resumes from disk."""
    media = str(tmp_path / "pics")
    make_corpus(media, 6)
    dim = embedder.cfg.projection_dim
    store = EmbeddingStore(str(tmp_path / "idx"), dim)
    index = VectorIndex(dim, store=store)
    scan_directory(embedder, index, media, chunk_size=3)

    # "crash" and restart: state comes back from the shard manifest
    store2 = EmbeddingStore(str(tmp_path / "idx"), dim)
    index2 = VectorIndex.from_store(store2)
    assert len(index2) == 6
    stats = scan_directory(embedder, index2, media, chunk_size=3)
    assert stats.embedded == 0


def test_scan_embeddings_match_direct_embed(tmp_path, embedder):
    """Pipeline output == straight embed_images of the same files."""
    media = str(tmp_path / "pics")
    paths = make_corpus(media, 5)
    index = VectorIndex(embedder.cfg.projection_dim)
    scan_directory(embedder, index, media, chunk_size=2, shuffle=False)

    imgs = [decode_image(p) for p in paths]
    want = embedder.embed_images(imgs)
    got = index.get_raw_embeddings(paths)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_multihost_partition_disjoint_and_complete(tmp_path, embedder):
    """Hash partitioning (process_index/count) covers every path exactly once."""
    media = str(tmp_path / "pics")
    make_corpus(media, 10)
    dim = embedder.cfg.projection_dim
    indexes = []
    total = 0
    for p in range(3):
        idx = VectorIndex(dim)
        stats = scan_directory(
            embedder, idx, media, chunk_size=4, process_index=p, process_count=3
        )
        total += stats.embedded
        indexes.append(set(idx.paths))
    assert total == 10
    assert not (indexes[0] & indexes[1]) and not (indexes[1] & indexes[2])
    assert len(indexes[0] | indexes[1] | indexes[2]) == 10


def test_decode_pool_single_worker_no_deadlock(tmp_path):
    """Regression (code review): submit_batch on a 1-worker pool must not
    deadlock (batch orchestration runs on its own thread)."""
    paths = make_corpus(str(tmp_path), 3)
    pool = DecodePool(workers=1)
    try:
        kept, images = pool.submit_batch(paths).result(timeout=30)
        assert kept == paths and len(images) == 3
    finally:
        pool.close()


def test_walker_follows_symlinks(tmp_path):
    """WalkDir::follow_links parity (clip.rs:52): symlinked dirs are scanned,
    broken symlinks are skipped."""
    real = tmp_path / "real"
    make_corpus(str(real), 3)
    linked_root = tmp_path / "library"
    linked_root.mkdir()
    (linked_root / "album").symlink_to(real, target_is_directory=True)
    (linked_root / "dangling.jpg").symlink_to(tmp_path / "missing.jpg")
    found = find_images(str(linked_root), shuffle=False)
    assert len(found) == 3
    assert all("album" in p for p in found)


def test_walker_survives_symlink_cycle(tmp_path):
    """A symlink loop under media_dir must not duplicate files (the
    reference's walkdir reports loops as errors; os.walk would re-emit
    every file once per nesting level until ELOOP)."""
    root = tmp_path / "pics"
    make_corpus(str(root), 3)
    (root / "loop").symlink_to(root, target_is_directory=True)
    found = find_images(str(root), shuffle=False)
    assert len(found) == 3  # each file exactly once
    assert len(set(found)) == 3


def test_walker_dedups_diamond_symlinks(tmp_path):
    """Two links to the same directory: its files are emitted once."""
    real = tmp_path / "real"
    make_corpus(str(real), 2)
    lib = tmp_path / "library"
    lib.mkdir()
    (lib / "a").symlink_to(real, target_is_directory=True)
    (lib / "b").symlink_to(real, target_is_directory=True)
    found = find_images(str(lib), shuffle=False)
    assert len(found) == 2


# --- thumbnail cache (round-3: decode each original once, ever) ---


def _thumb_corpus(root, n=4, size=(900, 1200)):
    import os

    import numpy as np
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(9)
    paths = []
    for i in range(n):
        p = os.path.join(root, f"big_{i}.jpg")
        Image.fromarray(
            rng.integers(0, 256, size=size + (3,), dtype=np.uint8)
        ).save(p, quality=95)
        paths.append(p)
    return paths


def test_thumb_cache_roundtrip_and_invalidation(tmp_path):
    import os
    import time

    import numpy as np

    from image_search_tpu.ingest.decode import decode_image
    from image_search_tpu.ingest.thumbcache import ThumbCache

    (p,) = _thumb_corpus(str(tmp_path / "pics"), n=1)
    cache = ThumbCache(str(tmp_path / "thumbs"), max_edge=448)
    assert cache.get(p) is None  # cold
    full = decode_image(p, draft_target=0)
    tile = cache.put(p, full)
    # shortest edge shrunk to max_edge, aspect kept
    assert min(tile.shape[:2]) == 448
    assert abs(tile.shape[1] / tile.shape[0] - full.shape[1] / full.shape[0]) < 0.01
    # hit returns BIT-IDENTICAL pixels to what put returned (first-scan and
    # rescan embeddings agree)
    hit = cache.get(p)
    np.testing.assert_array_equal(hit, tile)

    # touching the original invalidates the entry (stale key misses)
    time.sleep(0.01)
    os.utime(p)
    assert cache.get(p) is None
    cache.put(p, full)
    assert cache.get(p) is not None
    # superseded tile swept: exactly one entry for this path remains
    import glob

    entries = glob.glob(str(tmp_path / "thumbs" / "*" / "*.jpg"))
    assert len(entries) == 1


def test_decode_pool_uses_thumb_cache(tmp_path, monkeypatch):
    """Second decode_batch must not touch the originals at all."""
    from image_search_tpu.ingest import decode as decode_mod
    from image_search_tpu.ingest.decode import DecodePool
    from image_search_tpu.ingest.thumbcache import ThumbCache

    paths = _thumb_corpus(str(tmp_path / "pics"), n=3)
    cache = ThumbCache(str(tmp_path / "thumbs"))
    calls = []
    real = decode_mod.decode_image
    monkeypatch.setattr(
        decode_mod, "decode_image", lambda p, d: calls.append(p) or real(p, d)
    )
    pool = DecodePool(workers=2, thumb_cache=cache)
    try:
        kept1, imgs1 = pool.decode_batch(paths)
        assert len(kept1) == 3 and len(calls) == 3
        kept2, imgs2 = pool.decode_batch(paths)
        assert kept2 == kept1
        assert len(calls) == 3  # zero full decodes on the warm pass
        import numpy as np

        for a, b in zip(imgs1, imgs2):
            np.testing.assert_array_equal(a, b)
    finally:
        pool.close()
    assert cache.hits == 3 and cache.misses == 3


def test_scan_with_thumb_cache_embeddings_stable(tmp_path):
    """A rescan from tiles must index the SAME vectors the cold scan did;
    a fresh index rebuilt via the cache matches too (the model-upgrade
    re-embedding path)."""
    import jax
    import numpy as np

    from image_search_tpu.config import get_config
    from image_search_tpu.index import VectorIndex
    from image_search_tpu.ingest.pipeline import scan_directory
    from image_search_tpu.ingest.thumbcache import ThumbCache
    from image_search_tpu.models import get_model_module
    from image_search_tpu.models.embedder import ClipEmbedder

    _thumb_corpus(str(tmp_path / "pics"), n=3, size=(500, 640))
    cfg = get_config("clip-tiny-test")
    params = get_model_module(cfg).init_params(jax.random.key(0), cfg)
    embedder = ClipEmbedder(params, cfg)
    cache = ThumbCache(str(tmp_path / "thumbs"))

    idx1 = VectorIndex(cfg.projection_dim)
    scan_directory(embedder, idx1, str(tmp_path / "pics"), thumb_cache=cache)
    assert cache.misses == 3 and len(idx1) == 3

    idx2 = VectorIndex(cfg.projection_dim)
    scan_directory(embedder, idx2, str(tmp_path / "pics"), thumb_cache=cache)
    assert cache.hits >= 3 and len(idx2) == 3
    for p in idx1.live_paths():
        np.testing.assert_array_equal(
            idx1.get_raw_embeddings([p]), idx2.get_raw_embeddings([p])
        )


def test_decode_image_bytes_pixel_cap(monkeypatch):
    """Uploaded query bytes are untrusted: declared dimensions above the
    cap are rejected BEFORE any decoder allocates the output buffer."""
    import io

    import numpy as np
    from PIL import Image

    from image_search_tpu.ingest import decode as dec

    buf = io.BytesIO()
    Image.fromarray(
        np.zeros((200, 200, 3), np.uint8)
    ).save(buf, format="PNG")
    data = buf.getvalue()
    assert dec.decode_image_bytes(data) is not None
    monkeypatch.setattr(dec, "MAX_QUERY_PIXELS", 100 * 100)
    assert dec.decode_image_bytes(data) is None


def test_native_decode_bytes_enforces_pixel_cap():
    """The cap is enforced inside the native path itself (post-probe,
    pre-allocation) — so bytes whose header PIL cannot parse still cannot
    trigger a bomb allocation (round-3 review)."""
    import io

    import numpy as np
    from PIL import Image

    from image_search_tpu.ingest import native_decode

    if not native_decode.available():
        import pytest

        pytest.skip("native decoder not built")
    buf = io.BytesIO()
    Image.fromarray(np.zeros((64, 48, 3), np.uint8)).save(buf, format="PNG")
    data = buf.getvalue()
    assert native_decode.decode_bytes(data).shape == (64, 48, 3)
    assert native_decode.decode_bytes(data, max_pixels=64 * 48) is not None
    assert native_decode.decode_bytes(data, max_pixels=64 * 48 - 1) is None


def test_decode_image_bytes_cap_survives_pil_header_failure(monkeypatch):
    """A PIL-unparseable header used to skip the cap entirely while the
    native decoder still ran uncapped; the cap must hold regardless."""
    import io

    import numpy as np
    import PIL.Image
    from PIL import Image

    from image_search_tpu.ingest import decode as dec
    from image_search_tpu.ingest import native_decode

    if not native_decode.available():
        import pytest

        pytest.skip("native decoder not built")
    buf = io.BytesIO()
    Image.fromarray(np.zeros((200, 200, 3), np.uint8)).save(buf, format="PNG")
    data = buf.getvalue()

    def boom(*a, **k):
        raise OSError("cannot identify image file")

    monkeypatch.setattr(PIL.Image, "open", boom)
    monkeypatch.setattr(dec, "MAX_QUERY_PIXELS", 100 * 100)
    assert dec.decode_image_bytes(data) is None  # native cap, PIL blind
