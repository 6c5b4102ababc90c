"""VectorIndex correctness: exact top-k vs a numpy oracle, Rocchio semantics
vs the reference's average_slices weighting (search.rs:60-67, :127-150),
persistence, dedup, and the mesh-sharded path on 8 virtual devices.
"""

import numpy as np
import pytest

from image_search_tpu.index import EmbeddingStore, VectorIndex
from image_search_tpu.parallel import make_mesh

DIM = 64


def numpy_topk(emb_raw: np.ndarray, q_raw: np.ndarray, k: int):
    """Cosine top-k oracle on raw vectors."""
    e = emb_raw / np.linalg.norm(emb_raw, axis=1, keepdims=True)
    q = q_raw / np.linalg.norm(q_raw, axis=-1, keepdims=True)
    scores = q @ e.T
    idx = np.argsort(-scores, axis=-1, kind="stable")[..., :k]
    return np.take_along_axis(scores, idx, axis=-1), idx


def make_data(rng, n, dim=DIM):
    emb = rng.normal(size=(n, dim)).astype(np.float32) * rng.uniform(0.5, 2.0, size=(n, 1)).astype(np.float32)
    paths = [f"/pics/img_{i:05d}.jpg" for i in range(n)]
    return paths, emb


def test_search_matches_numpy_oracle(rng):
    paths, emb = make_data(rng, 500)
    idx = VectorIndex(DIM)
    assert idx.add(paths, emb) == 500
    q = rng.normal(size=(3, DIM)).astype(np.float32)
    s, i = idx.search(q, k=20)
    ws, wi = numpy_topk(emb, q, 20)
    np.testing.assert_allclose(s, ws, rtol=1e-5, atol=1e-5)
    # ties are possible in principle; compare score-aligned sets
    for b in range(3):
        assert set(i[b].tolist()) == set(wi[b].tolist())


def test_k_clamped_to_corpus_size(rng):
    paths, emb = make_data(rng, 10)
    idx = VectorIndex(DIM)
    idx.add(paths, emb)
    s, i = idx.search(rng.normal(size=DIM).astype(np.float32), k=1000)
    assert s.shape == (1, 10)


def test_empty_index(rng):
    idx = VectorIndex(DIM)
    s, i = idx.search(rng.normal(size=DIM).astype(np.float32), k=5)
    assert s.shape == (1, 0)


def test_dedup_by_path(rng):
    paths, emb = make_data(rng, 50)
    idx = VectorIndex(DIM)
    assert idx.add(paths, emb) == 50
    assert idx.add(paths[:10], emb[:10]) == 0  # re-scan: all duplicates
    assert len(idx) == 50


def test_incremental_add_matches_bulk(rng):
    paths, emb = make_data(rng, 300)
    a = VectorIndex(DIM)
    a.add(paths, emb)
    b = VectorIndex(DIM)
    for lo in range(0, 300, 37):
        b.add(paths[lo : lo + 37], emb[lo : lo + 37])
    q = rng.normal(size=(2, DIM)).astype(np.float32)
    sa, ia = a.search(q, 15)
    sb, ib = b.search(q, 15)
    np.testing.assert_allclose(sa, sb, atol=1e-6)
    np.testing.assert_array_equal(ia, ib)


def test_capacity_growth(rng):
    idx = VectorIndex(DIM, min_capacity=8192)
    total = 0
    for _ in range(3):
        paths, emb = make_data(rng, 5000)
        paths = [f"{p}.{total}" for p in paths]
        total += idx.add(paths, emb)
    assert len(idx) == 15000
    q = rng.normal(size=DIM).astype(np.float32)
    s, i = idx.search(q, 5)
    assert s.shape == (1, 5)
    assert (i < 15000).all()


def test_rocchio_matches_reference_weighting(rng):
    """Fused feedback step == reference math on raw vectors:
    query = average(average(selected), text) — search.rs:60-67."""
    paths, emb = make_data(rng, 200)
    idx = VectorIndex(DIM)
    idx.add(paths, emb)
    text = rng.normal(size=DIM).astype(np.float32)
    selected = [paths[7], paths[42], paths[99]]

    sel_avg = emb[[7, 42, 99]].mean(axis=0)
    ref_query = (sel_avg + text) / 2.0
    ws, wi = numpy_topk(emb, ref_query[None], 10)

    s, i = idx.search_with_feedback(text, selected, k=10)
    np.testing.assert_allclose(s, ws, rtol=1e-4, atol=1e-5)
    assert set(i[0].tolist()) == set(wi[0].tolist())


def test_rocchio_unknown_paths_fall_back_to_text(rng):
    paths, emb = make_data(rng, 100)
    idx = VectorIndex(DIM)
    idx.add(paths, emb)
    text = rng.normal(size=DIM).astype(np.float32)
    s1, i1 = idx.search_with_feedback(text, ["/nope.jpg"], k=5)
    s2, i2 = idx.search(text, k=5)
    np.testing.assert_allclose(s1, s2, atol=1e-6)
    np.testing.assert_array_equal(i1, i2)


def test_get_raw_embeddings_roundtrip(rng):
    paths, emb = make_data(rng, 64)
    idx = VectorIndex(DIM)
    idx.add(paths, emb)
    got = idx.get_raw_embeddings([paths[5], paths[20]])
    np.testing.assert_allclose(got, emb[[5, 20]], rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Persistence (EmbeddingStore)
# ---------------------------------------------------------------------------


def test_store_roundtrip(tmp_path, rng):
    paths, emb = make_data(rng, 120)
    store = EmbeddingStore(str(tmp_path / "idx"), DIM)
    store.append(paths[:80], emb[:80])
    store.append(paths[80:], emb[80:])

    store2 = EmbeddingStore(str(tmp_path / "idx"), DIM)
    got_paths, got_emb = store2.load_all()
    assert got_paths == paths
    np.testing.assert_allclose(got_emb, emb, atol=0)


def test_store_dedup(tmp_path, rng):
    paths, emb = make_data(rng, 30)
    store = EmbeddingStore(str(tmp_path / "idx"), DIM)
    assert store.append(paths, emb) == 30
    assert store.append(paths[:10], emb[:10]) == 0
    assert store.filter_new(paths + ["/new.jpg"]) == ["/new.jpg"]


def test_index_restores_from_store(tmp_path, rng):
    paths, emb = make_data(rng, 150)
    store = EmbeddingStore(str(tmp_path / "idx"), DIM)
    idx = VectorIndex(DIM, store=store)
    idx.add(paths, emb)

    # new process: rebuild from disk
    store2 = EmbeddingStore(str(tmp_path / "idx"), DIM)
    idx2 = VectorIndex.from_store(store2)
    assert len(idx2) == 150
    q = rng.normal(size=DIM).astype(np.float32)
    s1, i1 = idx.search(q, 7)
    s2, i2 = idx2.search(q, 7)
    np.testing.assert_allclose(s1, s2, atol=1e-6)
    np.testing.assert_array_equal(i1, i2)


# ---------------------------------------------------------------------------
# Sharded path (8 virtual CPU devices)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh()


def test_sharded_search_equals_local(rng, mesh8):
    paths, emb = make_data(rng, 1000)
    local = VectorIndex(DIM)
    local.add(paths, emb)
    sharded = VectorIndex(DIM, mesh=mesh8)
    sharded.add(paths, emb)

    q = rng.normal(size=(4, DIM)).astype(np.float32)
    sl, il = local.search(q, 25)
    ss, si = sharded.search(q, 25)
    np.testing.assert_allclose(ss, sl, rtol=1e-5, atol=1e-5)
    for b in range(4):
        assert set(si[b].tolist()) == set(il[b].tolist())


def test_sharded_feedback_equals_local(rng, mesh8):
    paths, emb = make_data(rng, 600)
    local = VectorIndex(DIM)
    local.add(paths, emb)
    sharded = VectorIndex(DIM, mesh=mesh8)
    sharded.add(paths, emb)

    text = rng.normal(size=DIM).astype(np.float32)
    sel = [paths[3], paths[77]]
    sl, il = local.search_with_feedback(text, sel, 12)
    ss, si = sharded.search_with_feedback(text, sel, 12)
    np.testing.assert_allclose(ss, sl, rtol=1e-5, atol=1e-5)
    assert set(si[0].tolist()) == set(il[0].tolist())


def test_sharded_k_larger_than_shard(rng, mesh8):
    """k > per-shard row count still returns exact global top-k."""
    paths, emb = make_data(rng, 4096 * 8)  # min capacity, all shards full
    sharded = VectorIndex(DIM, mesh=mesh8)
    sharded.add(paths, emb)
    q = rng.normal(size=DIM).astype(np.float32)
    s, i = sharded.search(q, 1000)
    ws, wi = numpy_topk(emb, q[None], 1000)
    np.testing.assert_allclose(s, ws, rtol=1e-5, atol=1e-5)
    assert set(i[0].tolist()) == set(wi[0].tolist())


def test_approx_search_on_cpu_falls_back_exact(rng):
    """approx=True must run everywhere; on CPU approx_max_k reduces to an
    exact top-k, so results equal the exact path."""
    paths, emb = make_data(rng, 400)
    idx = VectorIndex(DIM)
    idx.add(paths, emb)
    q = rng.normal(size=DIM).astype(np.float32)
    se, ie = idx.search(q, 20)
    sa, ia = idx.search(q, 20, approx=True)
    assert set(ia[0].tolist()) == set(ie[0].tolist())


def test_concurrent_search_during_add(rng):
    """Searches racing appends must never hit donated (deleted) buffers."""
    import threading

    idx = VectorIndex(DIM)
    paths, emb = make_data(rng, 200)
    idx.add(paths[:50], emb[:50])
    q = rng.normal(size=DIM).astype(np.float32)
    errors = []

    def searcher():
        try:
            for _ in range(60):
                s, i = idx.search(q, 10)
                assert s.shape[0] == 1
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def adder():
        try:
            for lo in range(50, 200, 10):
                idx.add([p + ".n" for p in paths[lo : lo + 10]], emb[lo : lo + 10])
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=searcher) for _ in range(3)] + [
        threading.Thread(target=adder)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors


def test_append_across_block_boundary_near_capacity(rng):
    """Regression (code review): a fixed 4096-row update block written near
    capacity must grow the buffer first — dynamic_update_slice CLAMPS
    out-of-bounds starts, which silently corrupted rows."""
    dim = 8
    idx = VectorIndex(dim, min_capacity=8192)
    e1 = rng.normal(size=(5000, dim)).astype(np.float32)
    idx.add([f"/p{i}" for i in range(5000)], e1)
    e2 = rng.normal(size=(100, dim)).astype(np.float32)
    idx.add([f"/q{i}" for i in range(100)], e2)
    assert len(idx) == 5100

    # every stored row must round-trip exactly
    got_old = idx.get_raw_embeddings(["/p4500"])
    np.testing.assert_allclose(got_old[0], e1[4500], rtol=1e-5, atol=1e-5)
    got_new = idx.get_raw_embeddings(["/q0"])
    np.testing.assert_allclose(got_new[0], e2[0], rtol=1e-5, atol=1e-5)
    # and a search for the new vector must find it
    s, i = idx.search(e2[0], 1)
    assert idx.paths_for(i[0]) == ["/q0"]


def test_sharded_approx_path_executes(rng, mesh8):
    """Regression (code review): approx=True must reach the sharded kernel
    (it was silently ignored on the mesh path). On CPU approx_max_k is
    exact, so results match the exact sharded search."""
    paths, emb = make_data(rng, 800)
    sharded = VectorIndex(DIM, mesh=mesh8)
    sharded.add(paths, emb)
    q = rng.normal(size=DIM).astype(np.float32)
    se, ie = sharded.search(q, 10)
    sa, ia = sharded.search(q, 10, approx=True)
    assert set(ia[0].tolist()) == set(ie[0].tolist())
    s2, i2 = sharded.search_with_feedback(q, [paths[5]], 10, approx=True)
    assert s2.shape == (1, 10)


def test_dedup_within_batch(rng):
    """A path repeated in ONE add() call inserts exactly one row (first
    occurrence wins) — a duplicate would leave a stale searchable row."""
    paths, emb = make_data(rng, 4)
    dup_paths = [paths[0], paths[1], paths[0], paths[2], paths[1]]
    dup_emb = np.stack([emb[0], emb[1], emb[3], emb[2], emb[3]])
    idx = VectorIndex(DIM)
    assert idx.add(dup_paths, dup_emb) == 3
    assert len(idx) == 3
    got = idx.get_raw_embeddings([paths[0], paths[1], paths[2]])
    np.testing.assert_allclose(got, np.stack([emb[0], emb[1], emb[2]]), rtol=1e-5)


def test_batched_feedback_matches_serial(rng):
    """One fused [B, m] feedback program == B serial searches: rows with
    selections match search_with_feedback, empty/unknown rows match the
    plain text search bitwise (query = 0.5*text normalizes identically)."""
    paths, emb = make_data(rng, 300)
    idx = VectorIndex(DIM)
    idx.add(paths, emb)
    texts = rng.normal(size=(4, DIM)).astype(np.float32)
    sels = [paths[:3], [], paths[10:25], ["/unknown.jpg"]]
    bs, bi = idx.search_with_feedback_batch(texts, sels, k=20)
    assert bs.shape == (4, 20) and bi.shape == (4, 20)
    for b in range(4):
        if any(p in set(paths) for p in sels[b]):
            ss, si = idx.search_with_feedback(texts[b], sels[b], k=20)
        else:
            ss, si = idx.search(texts[b], k=20)
        np.testing.assert_array_equal(bi[b], np.asarray(si).reshape(-1))
        np.testing.assert_allclose(bs[b], np.asarray(ss).reshape(-1), rtol=1e-5)


def test_sharded_batched_feedback_equals_local(rng, mesh8):
    """The mesh-sharded batched feedback program returns the local result."""
    paths, emb = make_data(rng, 256)
    local = VectorIndex(DIM)
    local.add(paths, emb)
    sharded = VectorIndex(DIM, mesh=mesh8)
    sharded.add(paths, emb)
    texts = rng.normal(size=(3, DIM)).astype(np.float32)
    sels = [paths[5:9], [], paths[100:102]]
    ls, li = local.search_with_feedback_batch(texts, sels, k=10)
    ss, si = sharded.search_with_feedback_batch(texts, sels, k=10)
    np.testing.assert_array_equal(li, si)
    np.testing.assert_allclose(ls, ss, rtol=1e-5)


# --- 10M-scale hardening (scaled-down slabs exercise the same machinery) ---


def test_slab_growth_lifecycle(rng):
    """Growth allocates ONE new slab at a time (never a 2x corpus copy):
    capacity overhang stays < 2 slabs, search stays exact across slab
    boundaries, and device bytes equal the slab inventory."""
    slab = 8192
    idx = VectorIndex(DIM, min_capacity=4096, slab_rows=slab)
    all_paths, all_emb = make_data(rng, 30000)
    peak_overhang = 0
    for lo in range(0, 30000, 700):  # odd chunk size: blocks straddle adds
        idx.add(all_paths[lo : lo + 700], all_emb[lo : lo + 700])
        peak_overhang = max(peak_overhang, idx.capacity - len(idx))
    assert len(idx) == 30000
    assert peak_overhang < 2 * slab  # growth granularity, not doubling
    row_bytes = DIM * 4 + 4  # f32 rows + norms
    assert idx.device_bytes() == idx.capacity * row_bytes
    # exactness across 4 slabs, including a feedback query whose selections
    # span different slabs
    q = rng.normal(size=(2, DIM)).astype(np.float32)
    s, i = idx.search(q, k=25)
    es, ei = numpy_topk(all_emb, q, 25)
    np.testing.assert_array_equal(i, ei)
    np.testing.assert_allclose(s, es, rtol=1e-5)
    sel = [all_paths[3], all_paths[9000], all_paths[25000]]  # 3 slabs
    fs, fi = idx.search_with_feedback(q[0], sel, k=25)
    raw_sel = np.stack([all_emb[3], all_emb[9000], all_emb[25000]])
    rocchio = (raw_sel.mean(axis=0) + q[0]) * 0.5
    es2, ei2 = numpy_topk(all_emb, rocchio[None], 25)
    np.testing.assert_array_equal(fi, ei2)


def test_preallocated_capacity_never_grows(rng):
    """--index-capacity: all slabs exist upfront; ingest allocates nothing."""
    idx = VectorIndex(DIM, slab_rows=8192, capacity=20000)
    assert idx.capacity >= 20000
    cap0, n_slabs0 = idx.capacity, len(idx._emb_slabs)
    paths, emb = make_data(rng, 15000)
    for lo in range(0, 15000, 500):
        idx.add(paths[lo : lo + 500], emb[lo : lo + 500])
    assert (idx.capacity, len(idx._emb_slabs)) == (cap0, n_slabs0)
    q = rng.normal(size=(1, DIM)).astype(np.float32)
    s, i = idx.search(q, k=10)
    es, ei = numpy_topk(emb, q, 10)
    np.testing.assert_array_equal(i, ei)


def test_sharded_slabbed_search_equals_local(rng, mesh8):
    """Multiple sharded slabs return the single-device result exactly."""
    local = VectorIndex(DIM, min_capacity=4096, slab_rows=8192)
    sharded = VectorIndex(DIM, mesh=mesh8, slab_rows=8192 * 8)
    paths, emb = make_data(rng, 20000)
    local.add(paths, emb)
    sharded.add(paths, emb)
    assert len(local._emb_slabs) > 1  # the point: multi-slab on the mesh path
    q = rng.normal(size=(2, DIM)).astype(np.float32)
    ls, li = local.search(q, k=15)
    ss, si = sharded.search(q, k=15)
    np.testing.assert_array_equal(li, si)
    np.testing.assert_allclose(ls, ss, rtol=1e-5)


def test_store_active_segment_appends(tmp_path, rng):
    """Many small appends share ONE active segment file (no shard-per-append
    explosion); sealing rolls to a new segment; restart restores everything."""
    import os

    store = EmbeddingStore(str(tmp_path), DIM, seg_rows=1000)
    paths, emb = make_data(rng, 2500)
    for lo in range(0, 2500, 100):  # 25 appends
        store.append(paths[lo : lo + 100], emb[lo : lo + 100])
    bins = [f for f in os.listdir(tmp_path) if f.endswith(".bin")]
    assert len(bins) <= 4  # 2 sealed + active (+1 slack), NOT 25 shards
    assert len(store) == 2500

    store2 = EmbeddingStore(str(tmp_path), DIM, seg_rows=1000)
    got_paths, got_emb = store2.load_all()
    assert got_paths == paths
    np.testing.assert_allclose(got_emb, emb, rtol=1e-6)


def test_store_crash_recovery(tmp_path, rng):
    """A torn append (rows flushed, path line half-written) is truncated to
    the last complete row on reopen; re-ingest resumes cleanly."""
    store = EmbeddingStore(str(tmp_path), DIM, seg_rows=10_000)
    paths, emb = make_data(rng, 50)
    store.append(paths, emb)
    # simulate a crash mid-append: extra rows in .bin, torn paths line
    bin_f = store._file(store._active, ".bin")
    paths_f = store._file(store._active, ".paths")
    with open(bin_f, "ab") as f:
        f.write(np.zeros((3, DIM), "<f4").tobytes())
        f.write(b"\x01\x02")  # partial row
    with open(paths_f, "a") as f:
        f.write('"/pics/torn_a.jpg"\n')
        f.write('"/pics/torn')  # no newline, invalid JSON

    store2 = EmbeddingStore(str(tmp_path), DIM, seg_rows=10_000)
    # min(bin=53, paths=51) = 51 complete rows survive
    assert len(store2) == 51
    more_paths, more_emb = make_data(rng, 10)
    more_paths = [p.replace("img", "more") for p in more_paths]
    store2.append(more_paths, more_emb)
    store3 = EmbeddingStore(str(tmp_path), DIM, seg_rows=10_000)
    assert len(store3) == 61
    got_paths, got_emb = store3.load_all()
    assert got_paths[-10:] == more_paths
    np.testing.assert_allclose(got_emb[-10:], more_emb, rtol=1e-6)


def test_store_clean_restart_never_rewrites(tmp_path, rng):
    """A consistent active segment must not be rewritten on reopen: recovery
    only ever TRUNCATES in place, so there is no window where a crash during
    reopen can destroy durably-committed rows (round-2 review finding)."""
    import os

    store = EmbeddingStore(str(tmp_path), DIM, seg_rows=10_000)
    paths, emb = make_data(rng, 40)
    store.append(paths, emb)
    paths_f = store._file(store._active, ".paths")
    bin_f = store._file(store._active, ".bin")
    before = (open(paths_f, "rb").read(), os.path.getsize(bin_f))
    stat_before = os.stat(paths_f)

    store2 = EmbeddingStore(str(tmp_path), DIM, seg_rows=10_000)
    assert len(store2) == 40
    after = (open(paths_f, "rb").read(), os.path.getsize(bin_f))
    assert after == before
    # same inode, never recreated/rewritten
    assert os.stat(paths_f).st_ino == stat_before.st_ino
    assert os.stat(paths_f).st_mtime_ns == stat_before.st_mtime_ns


def test_store_pax_sidecar_written_and_used(tmp_path, rng):
    """Sealing writes a binary .pax path sidecar; reopening reads it (not
    the JSONL); deleting it falls back to JSONL and heals it back."""
    import os

    store = EmbeddingStore(str(tmp_path), DIM, seg_rows=100)
    paths, emb = make_data(rng, 250)  # 2 sealed segments + active(50)
    for lo in range(0, 250, 50):
        store.append(paths[lo : lo + 50], emb[lo : lo + 50])
    pax = sorted(f for f in os.listdir(tmp_path) if f.endswith(".pax"))
    assert len(pax) == 2  # one per SEALED segment, none for the active

    store2 = EmbeddingStore(str(tmp_path), DIM, seg_rows=100)
    got_paths, got_emb = store2.load_all()
    assert got_paths == paths
    np.testing.assert_allclose(got_emb, emb, rtol=1e-6)

    # kill one sidecar: reopen must fall back to JSONL, agree, and heal
    os.remove(os.path.join(tmp_path, pax[0]))
    store3 = EmbeddingStore(str(tmp_path), DIM, seg_rows=100)
    assert store3.load_all()[0] == paths
    assert os.path.exists(os.path.join(tmp_path, pax[0]))

    # corrupt sidecar (truncated blob) must be detected, not trusted
    with open(os.path.join(tmp_path, pax[1]), "r+b") as f:
        f.truncate(os.path.getsize(os.path.join(tmp_path, pax[1])) - 7)
    store4 = EmbeddingStore(str(tmp_path), DIM, seg_rows=100)
    assert store4.load_all()[0] == paths


def test_store_pax_non_utf8_paths_roundtrip(tmp_path, rng):
    """Paths with undecodable filesystem bytes (surrogateescape strs, the
    os.walk convention) survive the binary sidecar round-trip."""
    store = EmbeddingStore(str(tmp_path), DIM, seg_rows=4)
    weird = [
        "/pics/caf\udce9.jpg",  # latin-1 0xe9 via surrogateescape
        "/pics/new\nline.jpg",  # newline is legal in POSIX paths
        "/pics/sp ace \t.jpg",
        "/pics/unicode-é中.jpg",
    ]
    emb = rng.standard_normal((4, DIM)).astype(np.float32)
    store.append(weird, emb)  # seals exactly one segment
    store2 = EmbeddingStore(str(tmp_path), DIM, seg_rows=4)
    assert store2.load_all()[0] == weird
    assert store2.existing(weird) == set(weird)


def test_store_open_is_lazy_and_liveness_uses_bytes(tmp_path, rng):
    """Open never parses sealed path files (O(segments) restart); the dedup
    set builds on first use; the bytes-level liveness pass agrees with the
    decoded one, including re-add-after-tombstone."""
    store = EmbeddingStore(str(tmp_path), DIM, seg_rows=50)
    paths, emb = make_data(rng, 120)
    store.append(paths, emb)
    store.tombstone(paths[10:40])
    store.append(paths[20:25], emb[20:25])  # re-add 5 after tombstone

    store2 = EmbeddingStore(str(tmp_path), DIM, seg_rows=50)
    assert not store2._path_set_ready  # open built no dedup set
    live, dead = store2.liveness()
    # sealed segments went through the bytes fast path (cache untouched)
    assert not store2._path_set_ready
    assert dead == set(paths[10:20] + paths[25:40])
    assert int(live.sum()) == 120 + 5 - 30  # 125 rows, 30 dead
    # re-added rows are the LAST occurrences (rows 120..124)
    assert live[120:125].all()
    assert not live[20:25].any()
    # first dedup call builds the set and honors tombstones
    assert store2.filter_new(paths[:30]) == paths[10:20] + paths[25:30]
    assert store2._path_set_ready


def test_store_v1_backward_compat(tmp_path, rng):
    """A version-1 store (shard_*.npy per append) loads transparently and
    new appends land in a v2 active segment."""
    import json as _json
    import os

    paths, emb = make_data(rng, 30)
    np.save(os.path.join(tmp_path, "shard_00000.npy"), emb[:20])
    with open(os.path.join(tmp_path, "shard_00000.paths.json"), "w") as f:
        _json.dump(paths[:20], f)
    with open(os.path.join(tmp_path, "manifest.json"), "w") as f:
        _json.dump({"dim": DIM, "version": 1, "shards": ["shard_00000"]}, f)

    store = EmbeddingStore(str(tmp_path), DIM)
    assert len(store) == 20
    store.append(paths[20:], emb[20:])
    store2 = EmbeddingStore(str(tmp_path), DIM)
    got_paths, got_emb = store2.load_all()
    assert got_paths == paths
    np.testing.assert_allclose(got_emb, emb, rtol=1e-6)


def test_hierarchical_exact_topk():
    """ops/topk.py exact_topk == lax.top_k on a corpus big enough to take
    the hierarchical path, including adversarial tie mass at the k-th value
    (values must match exactly; indices must be a valid tie-broken top-k)."""
    import jax
    import jax.numpy as jnp

    from image_search_tpu.ops.topk import exact_topk

    rng2 = np.random.default_rng(7)
    n, k = 512 * 1024, 100  # NR = 4096 >= HOLD -> hierarchical path
    scores = rng2.standard_normal((2, n)).astype(np.float32)
    got_v, got_i = exact_topk(jnp.asarray(scores), k)
    ref_v, ref_i = jax.lax.top_k(jnp.asarray(scores), k)
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_i))

    # tie storm: 5000 identical maxima spread across rows
    adv = np.zeros((1, n), np.float32)
    idx = rng2.choice(n, size=5000, replace=False)
    adv[0, idx] = 1.0
    got_v, got_i = exact_topk(jnp.asarray(adv), k)
    assert np.all(np.asarray(got_v) == 1.0)
    assert np.all(adv[0, np.asarray(got_i[0])] == 1.0)
    assert len(set(np.asarray(got_i[0]).tolist())) == k  # distinct indices

    # small corpus takes the plain fallback and stays exact
    small = rng2.standard_normal((1, 1000)).astype(np.float32)
    gv, gi = exact_topk(jnp.asarray(small), 10)
    rv, ri = jax.lax.top_k(jnp.asarray(small), 10)
    np.testing.assert_array_equal(np.asarray(gv), np.asarray(rv))


# --- tombstone deletion (no reference counterpart: it can never remove) ---


def test_remove_paths_excludes_from_search(rng):
    paths, emb = make_data(rng, 300)
    idx = VectorIndex(DIM)
    idx.add(paths, emb)
    dead = paths[10:40]
    assert idx.remove_paths(dead) == 30
    assert len(idx) == 270 and idx.removed_count == 30
    assert not idx.has_path(dead[0])

    q = rng.normal(size=(2, DIM)).astype(np.float32)
    s, i = idx.search(q, k=50)
    returned = set(i.reshape(-1).tolist())
    assert returned.isdisjoint(set(range(10, 40)))
    # surviving rows score exactly as an index built without the dead rows
    live_mask = np.ones(300, bool)
    live_mask[10:40] = False
    ws, wi = numpy_topk(emb[live_mask], q, 50)
    live_ids = np.arange(300)[live_mask]
    np.testing.assert_allclose(s, ws, rtol=1e-5, atol=1e-5)
    for b in range(2):
        assert set(i[b].tolist()) == set(live_ids[wi[b]].tolist())

    # removing unknown/already-removed paths is a no-op
    assert idx.remove_paths(dead + ["/pics/nope.jpg"]) == 0


def test_remove_then_readd_is_live_again(rng):
    paths, emb = make_data(rng, 64)
    idx = VectorIndex(DIM)
    idx.add(paths, emb)
    idx.remove_paths([paths[5]])
    assert idx.add([paths[5]], emb[5:6]) == 1
    assert len(idx) == 64
    s, i = idx.search(emb[5], k=1)
    assert int(i[0, 0]) == 64  # fresh row, not the tombstoned one
    assert s[0, 0] == pytest.approx(1.0, abs=1e-5)


def test_remove_excluded_from_feedback_gather(rng):
    paths, emb = make_data(rng, 128)
    idx = VectorIndex(DIM)
    idx.add(paths, emb)
    text = rng.normal(size=DIM).astype(np.float32)
    s_before, _ = idx.search_with_feedback(text, [paths[3]], k=5)
    idx.remove_paths([paths[3]])
    # selection of a tombstoned path degrades to plain text search
    s_after, i_after = idx.search_with_feedback(text, [paths[3]], k=5)
    s_plain, i_plain = idx.search(text, k=5)
    np.testing.assert_array_equal(i_after, i_plain)
    np.testing.assert_allclose(s_after, s_plain, rtol=1e-6)


def test_tombstones_survive_restart(tmp_path, rng):
    paths, emb = make_data(rng, 100)
    store = EmbeddingStore(str(tmp_path), DIM)
    idx = VectorIndex(DIM, store=store)
    idx.add(paths, emb)
    idx.remove_paths(paths[:20])
    # re-add path 7 AFTER its tombstone: must come back live on restore
    assert idx.add([paths[7]], emb[7:8]) == 1

    store2 = EmbeddingStore(str(tmp_path), DIM)
    idx2 = VectorIndex.from_store(store2)
    assert len(idx2) == len(idx) == 81
    # restore SKIPS dead rows outright (no penalty slabs, no dead HBM)
    assert idx2.removed_count == 0
    assert not idx2.has_path(paths[3])
    assert idx2.has_path(paths[7])
    q = rng.normal(size=DIM).astype(np.float32)
    s1, i1 = idx.search(q, k=30)
    s2, i2 = idx2.search(q, k=30)
    np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-5)


def test_remove_sharded_matches_local(rng):
    paths, emb = make_data(rng, 512)
    mesh = make_mesh(8, 1)
    local = VectorIndex(DIM)
    sharded = VectorIndex(DIM, mesh=mesh)
    for ix in (local, sharded):
        ix.add(paths, emb)
        ix.remove_paths(paths[100:200])
    q = rng.normal(size=(2, DIM)).astype(np.float32)
    ls, li = local.search(q, k=25)
    ss, si = sharded.search(q, k=25)
    np.testing.assert_allclose(ls, ss, rtol=1e-5, atol=1e-5)
    for b in range(2):
        assert set(li[b].tolist()) == set(si[b].tolist())
    assert set(si.reshape(-1).tolist()).isdisjoint(set(range(100, 200)))


def test_remove_int8_rows(rng):
    paths, emb = make_data(rng, 256)
    idx = VectorIndex(DIM, quantize="int8")
    idx.add(paths, emb)
    idx.remove_paths(paths[:128])
    _, i = idx.search(rng.normal(size=DIM).astype(np.float32), k=20)
    assert set(i.reshape(-1).tolist()).isdisjoint(set(range(128)))


def test_store_compact_drops_tombstoned_rows(tmp_path, rng):
    """compact() rewrites the store without dead rows, clears the tombstone
    log, and a rebuilt index sees the identical live corpus with ZERO
    tombstone penalties (dead rows' memory reclaimed)."""
    import os

    paths, emb = make_data(rng, 200)
    store = EmbeddingStore(str(tmp_path), DIM, seg_rows=64)  # several segments
    idx = VectorIndex(DIM, store=store)
    idx.add(paths, emb)
    idx.remove_paths(paths[30:90])
    idx.add([paths[40]], emb[40:41])  # re-add after tombstone: stays live
    q = rng.normal(size=(2, DIM)).astype(np.float32)
    s_before, i_before = idx.search(q, k=40)
    live_before = sorted(idx.live_paths())

    store2 = EmbeddingStore(str(tmp_path), DIM, seg_rows=64)
    kept, dropped = store2.compact()
    # store held 201 rows (200 + the re-add); 60 are dead (rows 30..89,
    # incl. the SUPERSEDED old row for path 40 — its re-add row lives)
    assert kept == 141
    assert dropped == 60
    assert not os.path.exists(tmp_path / "tombstones.jsonl")

    store3 = EmbeddingStore(str(tmp_path), DIM, seg_rows=64)
    idx3 = VectorIndex.from_store(store3)
    assert idx3.removed_count == 0
    assert sorted(idx3.live_paths()) == live_before
    s_after, i_after = idx3.search(q, k=40)
    np.testing.assert_allclose(s_before, s_after, rtol=1e-5, atol=1e-5)
    # paths agree row-for-row even though global ids were renumbered
    for b in range(2):
        assert [idx3.paths[int(i)] for i in i_after[b]] == [
            idx.paths[int(i)] for i in i_before[b]
        ]

    # appends still work post-compaction and dedup respects the live set
    more_paths = [f"/pics/new_{i}.jpg" for i in range(5)]
    assert idx3.add(more_paths, emb[:5]) == 5
    assert idx3.add([paths[0]], emb[0:1]) == 0  # still-live path dedups


def test_recompaction_reused_segment_name_serves_fresh_paths(tmp_path, rng):
    """Round-3 review: two compactions in ONE process can reuse a swept
    segment NAME (free_seg_index restarts below the old numbering once the
    old files are deleted) — the startup path cache must not serve the
    dead segment's paths for the new content."""
    paths, emb = make_data(rng, 120)
    store = EmbeddingStore(str(tmp_path), DIM, seg_rows=32)
    idx = VectorIndex(DIM, store=store)
    idx.add(paths, emb)

    maint = EmbeddingStore(str(tmp_path), DIM, seg_rows=32)
    maint.tombstone([paths[0]])
    maint.compact()
    first_names = {n for n, _, _ in maint._sealed}
    maint.tombstone([paths[1]])
    maint.compact()  # may reuse a name from `first_names`' era
    got_paths, got_rows = maint.load_all()
    assert sorted(got_paths) == sorted(set(paths) - {paths[0], paths[1]})
    # row data matches path-for-path (stale cached paths would misalign)
    by_path = {p: emb[i] for i, p in enumerate(paths)}
    for p, r in zip(got_paths, got_rows):
        np.testing.assert_array_equal(r, by_path[p])
    # a FRESH store agrees (disk truth)
    fresh_paths, fresh_rows = EmbeddingStore(str(tmp_path), DIM, seg_rows=32).load_all()
    assert fresh_paths == got_paths
    np.testing.assert_array_equal(fresh_rows, got_rows)


def test_store_compact_noop_without_tombstones(tmp_path, rng):
    paths, emb = make_data(rng, 50)
    store = EmbeddingStore(str(tmp_path), DIM)
    store.append(paths, emb)
    kept, dropped = store.compact()
    assert (kept, dropped) == (50, 0)
    store2 = EmbeddingStore(str(tmp_path), DIM)
    got_paths, _ = store2.load_all()
    assert got_paths == paths


def test_compact_store_cli(tmp_path, rng):
    import subprocess
    import sys as _sys

    paths, emb = make_data(rng, 40)
    store = EmbeddingStore(str(tmp_path), DIM)
    idx = VectorIndex(DIM, store=store)
    idx.add(paths, emb)
    idx.remove_paths(paths[:10])
    out = subprocess.run(
        [_sys.executable, "tools/compact_store.py", "--index-dir", str(tmp_path)],
        capture_output=True, text=True, check=True,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
    )
    assert "30 rows kept, 10 dropped" in out.stdout
    idx2 = VectorIndex.from_store(EmbeddingStore(str(tmp_path), DIM))
    assert len(idx2) == 30 and idx2.removed_count == 0


def test_stale_tombstones_ignored_after_compact_crash(tmp_path, rng):
    """Round-2 review finding: a crash between compact's manifest commit and
    the tombstone-log deletion must NOT let stale records (old-generation
    row coordinates) kill live rows on restore."""
    import os
    import shutil

    paths, emb = make_data(rng, 30)
    store = EmbeddingStore(str(tmp_path), DIM)
    idx = VectorIndex(DIM, store=store)
    idx.add(paths, emb)
    idx.remove_paths([paths[10]])
    idx.add([paths[10]], emb[10:11])  # re-added: live at store row 31

    tomb_file = os.path.join(str(tmp_path), EmbeddingStore.TOMBSTONES)
    stale = open(tomb_file).read()
    EmbeddingStore(str(tmp_path), DIM).compact()
    assert not os.path.exists(tomb_file)
    # simulate the crash window: the old tombstone log survives the commit
    with open(tomb_file, "w") as f:
        f.write(stale)

    idx2 = VectorIndex.from_store(EmbeddingStore(str(tmp_path), DIM))
    assert idx2.has_path(paths[10])  # stale record ignored (old generation)
    assert len(idx2) == 30
    # and a second compact must not delete the live row's data
    EmbeddingStore(str(tmp_path), DIM).compact()
    idx3 = VectorIndex.from_store(EmbeddingStore(str(tmp_path), DIM))
    assert idx3.has_path(paths[10]) and len(idx3) == 30


def test_compact_sweeps_orphan_segments(tmp_path, rng):
    """Orphaned segment files from a compaction that crashed BEFORE its
    manifest commit are reclaimed by the next successful compact."""
    import os

    paths, emb = make_data(rng, 20)
    store = EmbeddingStore(str(tmp_path), DIM)
    idx = VectorIndex(DIM, store=store)
    idx.add(paths, emb)
    idx.remove_paths(paths[:5])
    # orphan files no manifest references (a crashed compact attempt)
    open(tmp_path / "seg_00099.bin", "wb").write(b"\x00" * 256)
    open(tmp_path / "seg_00099.paths", "w").write('"/pics/orphan.jpg"\n')

    store2 = EmbeddingStore(str(tmp_path), DIM)
    kept, dropped = store2.compact()
    assert (kept, dropped) == (15, 5)
    assert not os.path.exists(tmp_path / "seg_00099.bin")
    assert not os.path.exists(tmp_path / "seg_00099.paths")
    idx2 = VectorIndex.from_store(EmbeddingStore(str(tmp_path), DIM))
    assert len(idx2) == 15 and not idx2.has_path("/pics/orphan.jpg")


# --- near-duplicate detection (no reference counterpart) ---


def test_find_near_duplicates(rng):
    paths, emb = make_data(rng, 400)
    # plant three exact-duplicate pairs and one triple (scaled copies:
    # cosine 1.0 regardless of norm)
    emb[100] = emb[7] * 2.0
    emb[200] = emb[55] * 0.5
    emb[300] = emb[55] * 3.0
    idx = VectorIndex(DIM)
    idx.add(paths, emb)
    pairs = idx.find_near_duplicates(threshold=0.999, batch=128)
    got = {(i, j) for i, j, _ in pairs}
    assert (7, 100) in got
    assert {(55, 200), (55, 300), (200, 300)} <= got
    # random gaussian rows at DIM=64 essentially never hit 0.999
    assert len(got) == 4
    for i, j, s in pairs:
        assert i < j and s >= 0.999


def test_find_near_duplicates_skips_tombstoned(rng):
    paths, emb = make_data(rng, 100)
    emb[50] = emb[10]
    idx = VectorIndex(DIM)
    idx.add(paths, emb)
    assert {(i, j) for i, j, _ in idx.find_near_duplicates(0.999)} == {(10, 50)}
    idx.remove_paths([paths[50]])
    assert idx.find_near_duplicates(0.999) == []


def test_find_near_duplicates_sharded_and_int8(rng):
    paths, emb = make_data(rng, 512)
    emb[300] = emb[20] * 1.5
    for kwargs in ({"mesh": make_mesh(8, 1)}, {"quantize": "int8"}):
        idx = VectorIndex(DIM, **kwargs)
        idx.add(paths, emb)
        got = {(i, j) for i, j, _ in idx.find_near_duplicates(0.995, batch=256)}
        assert (20, 300) in got


def test_find_near_duplicates_cluster_larger_than_neighbors(rng):
    """Review-reproduced regression: an 11-copy cluster with neighbors=8
    must not lose its highest-id members (top-k tie-breaking shows them
    only from their own query side)."""
    paths, emb = make_data(rng, 400)
    for r in range(30, 41):
        emb[r] = emb[30] * (1.0 + 0.01 * (r - 30))  # scaled copies
    idx = VectorIndex(DIM)
    idx.add(paths, emb)
    pairs = idx.find_near_duplicates(threshold=0.999, neighbors=8)
    members = set()
    for i, j, _ in pairs:
        members.update((i, j))
    assert set(range(30, 41)) <= members


# --- round-3 advisor findings: store crash-safety hardening ---


def test_store_recovery_truncates_torn_partial_trailing_row(tmp_path, rng):
    """Advisor (round 2, high): a crash during the FIRST row of a batch's
    .bin write leaves bin_rows == path lines plus stray partial-row bytes;
    recovery must truncate them or every later append reads back shifted."""
    import os

    store = EmbeddingStore(str(tmp_path), DIM, seg_rows=10_000)
    paths, emb = make_data(rng, 50)
    store.append(paths, emb)
    bin_f = store._file(store._active, ".bin")
    with open(bin_f, "ab") as f:
        f.write(b"\x01\x02\x03")  # partial row, no complete extra rows
    assert os.path.getsize(bin_f) == 50 * DIM * 4 + 3

    store2 = EmbeddingStore(str(tmp_path), DIM, seg_rows=10_000)
    assert len(store2) == 50
    assert os.path.getsize(bin_f) == 50 * DIM * 4  # garbage truncated
    row = np.full((1, DIM), 7.0, np.float32)
    store2.append(["/pics/after_crash.jpg"], row)

    store3 = EmbeddingStore(str(tmp_path), DIM, seg_rows=10_000)
    got_paths, got_emb = store3.load_all()
    assert got_paths[-1] == "/pics/after_crash.jpg"
    np.testing.assert_array_equal(got_emb[-1], row[0])  # NOT byte-shifted


def _store_with_exclusion(tmp_path, rng):
    paths, emb = make_data(rng, 20)
    store = EmbeddingStore(str(tmp_path), DIM)
    store.append(paths, emb)
    store.tombstone([paths[3]], exclude=True)
    assert store.excluded_paths() == {paths[3]}
    return paths


def test_compact_crash_before_manifest_commit_keeps_exclusions(tmp_path, rng):
    """A compact that dies BEFORE its manifest commit must leave the old
    generation fully governing: rows intact, exclusion intact."""
    paths = _store_with_exclusion(tmp_path, rng)
    store2 = EmbeddingStore(str(tmp_path), DIM)

    def boom(*a, **k):
        raise RuntimeError("injected crash before manifest commit")

    store2._start_active = boom
    with pytest.raises(RuntimeError):
        store2.compact()

    store3 = EmbeddingStore(str(tmp_path), DIM)
    assert store3.excluded_paths() == {paths[3]}
    assert len(store3) == 20  # 19 live + the dead row still in the file
    live, dead = store3.liveness()
    assert dead == {paths[3]} and int(live.sum()) == 19


def test_compact_crash_after_commit_before_cleanup_keeps_exclusions(tmp_path, rng):
    """Advisor (round 2, low): the remove-then-rewrite window permanently
    dropped exclusions. Now next-generation records are durable BEFORE the
    commit, so a crash before the stale-record cleanup loses nothing."""
    import os as _os

    from image_search_tpu.index import store as store_mod

    paths = _store_with_exclusion(tmp_path, rng)
    store2 = EmbeddingStore(str(tmp_path), DIM)
    real_replace = _os.replace

    def flaky_replace(src, dst):
        if dst.endswith(EmbeddingStore.TOMBSTONES):
            raise RuntimeError("injected crash during cleanup")
        return real_replace(src, dst)

    store_mod.os.replace = flaky_replace
    try:
        with pytest.raises(RuntimeError):
            store2.compact()
    finally:
        store_mod.os.replace = real_replace

    store3 = EmbeddingStore(str(tmp_path), DIM)
    assert store3.excluded_paths() == {paths[3]}  # survived the crash
    assert len(store3) == 19  # compaction itself committed
    # a later clean compact converges (stale old-gen records swept)
    store3.compact()
    store4 = EmbeddingStore(str(tmp_path), DIM)
    assert store4.excluded_paths() == {paths[3]}
    assert len(store4) == 19


def test_store_exclude_paths_records_rowless_exclusion(tmp_path, rng):
    """exclude_paths() durably excludes a path with no live rows (the
    /remove-after-prune case) without touching liveness."""
    paths, emb = make_data(rng, 10)
    store = EmbeddingStore(str(tmp_path), DIM)
    store.append(paths, emb)
    assert store.exclude_paths(["/pics/pruned_long_ago.jpg"]) == 1
    assert store.exclude_paths([paths[0]]) == 0  # live rows: must tombstone

    store2 = EmbeddingStore(str(tmp_path), DIM)
    assert store2.excluded_paths() == {"/pics/pruned_long_ago.jpg"}
    live, dead = store2.liveness()
    assert int(live.sum()) == 10  # all real rows still live


def test_find_near_duplicates_progress_callback(rng):
    """Long self-scans must be observable: the progress callback fires per
    batch with monotonically increasing (done, total)."""
    paths, emb = make_data(rng, 300)
    emb[200] = emb[10] * 2.0
    idx = VectorIndex(DIM)
    idx.add(paths, emb)
    calls = []
    pairs = idx.find_near_duplicates(
        threshold=0.999, batch=128, progress=lambda d, t: calls.append((d, t))
    )
    assert {(i, j) for i, j, _ in pairs} == {(10, 200)}
    assert calls == [(128, 300), (256, 300), (300, 300)]


def test_hbm_budget_guard_fails_fast(rng, monkeypatch):
    """Growth past the device budget must raise an actionable error BEFORE
    allocating (a device OOM on a remote TPU runtime can wedge the whole
    process). Budget override via ISX_INDEX_HBM_BUDGET_GB."""
    paths, emb = make_data(rng, 64)
    # ~0.003 GB budget: the initial 8192-row f32 slab (~25 MB) fits only
    # until growth is requested
    monkeypatch.setenv("ISX_INDEX_HBM_BUDGET_GB", "0.003")
    idx = VectorIndex(DIM)
    with pytest.raises(RuntimeError, match="index-quantize int8"):
        idx._ensure_capacity(1_000_000)
    # preallocation is guarded too
    with pytest.raises(RuntimeError, match="HBM_BUDGET"):
        VectorIndex(DIM, capacity=1_000_000)
    # <=0 disables the guard entirely
    monkeypatch.setenv("ISX_INDEX_HBM_BUDGET_GB", "0")
    idx2 = VectorIndex(DIM)
    idx2.add(paths, emb)
    assert len(idx2) == 64
