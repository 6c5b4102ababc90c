"""Two-stage certified-exact search (index/twostage.py): the answer must
EQUAL the full scan's on every code path — certification only decides how
many bytes were read, never what is returned."""

import numpy as np
import pytest

from image_search_tpu.index.index import VectorIndex

DIM = 256
RANK = 32  # intrinsic dimensionality of the "realistic" corpus


def concentrated(rng, n, noise=0.02):
    """Low-rank + noise rows: the spectral shape real embeddings have."""
    m = rng.normal(size=(RANK, DIM))
    x = rng.normal(size=(n, RANK)) @ m + noise * rng.normal(size=(n, DIM))
    return (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)


def flat(rng, n):
    x = rng.normal(size=(n, DIM))
    return (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def assert_same_answer(got, want):
    gs, gi = got
    ws, wi = want
    np.testing.assert_array_equal(gi, wi)
    np.testing.assert_allclose(gs, ws, rtol=0, atol=2e-6)


@pytest.mark.parametrize("quantize", [None, "int8"])
def test_certified_exact_on_concentrated_corpus(rng, quantize):
    n, k, c = 20_000, 100, 512
    emb = concentrated(rng, n)
    idx = VectorIndex(DIM, quantize=quantize)
    idx.add([f"p{i}" for i in range(n)], emb)
    idx.build_sketch()
    assert idx.sketch_fresh
    q = concentrated(rng, 3)
    want = idx.search(q, k)
    got = idx.search_twostage(q, k, candidates=c)
    assert idx.twostage_certified == 1 and idx.twostage_fallbacks == 0
    if quantize == "int8":
        # integer arithmetic on both routes: scores are BITWISE equal
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])
    else:
        assert_same_answer(got, want)


def test_fallback_on_flat_corpus_still_exact(rng):
    """Spectrally flat data defeats the bound (documented worst case): the
    certificate must FAIL and the fallback must return the full-scan
    answer."""
    n, k = 20_000, 100
    emb = flat(rng, n)
    idx = VectorIndex(DIM)
    idx.add([f"p{i}" for i in range(n)], emb)
    idx.build_sketch()
    q = flat(rng, 2)
    want = idx.search(q, k)
    got = idx.search_twostage(q, k, candidates=k + 16)
    assert idx.twostage_fallbacks == 1 and idx.twostage_certified == 0
    assert_same_answer(got, want)


def test_adaptive_disable_after_consecutive_failures(rng):
    """A flat corpus fails the certificate on every query; after
    TWOSTAGE_DISABLE_AFTER consecutive failures the sketch is dropped so
    queries stop paying bound pass + full scan. build_sketch re-arms."""
    n, k = 8_000, 20
    emb = flat(rng, n)
    idx = VectorIndex(DIM)
    idx.add([f"p{i}" for i in range(n)], emb)
    idx.build_sketch()
    q = flat(rng, 1)
    # candidates small relative to the corpus: at the default 4096 the
    # block path's m clamps to nb-1 and rescores EVERY valid row, which is
    # legitimately certified-exact even on flat data (full coverage) — the
    # failure/disable machinery is about partial-coverage certificates
    for j in range(VectorIndex.TWOSTAGE_DISABLE_AFTER):
        got = idx.search_twostage(q, k, candidates=8)  # exact (fallback)
        assert_same_answer(got, idx.search(q, k))
    assert idx._sketch is None  # disabled
    before = idx.twostage_fallbacks
    idx.search_twostage(q, k)  # no bound pass, straight to full scan
    assert idx.twostage_fallbacks == before + 1
    idx.build_sketch()  # re-armed
    assert idx.sketch_fresh
    assert idx._twostage_consec_failures == 0
    # a certified success RESETS the consecutive counter
    idx2 = VectorIndex(DIM)
    emb2 = concentrated(rng, n)
    idx2.add([f"c{i}" for i in range(n)], emb2)
    idx2.build_sketch()
    idx2._twostage_consec_failures = VectorIndex.TWOSTAGE_DISABLE_AFTER - 1
    idx2.search_twostage(concentrated(rng, 1), k, candidates=512)
    assert idx2.twostage_certified == 1
    assert idx2._twostage_consec_failures == 0


def test_append_keeps_sketch_fresh_incrementally(rng):
    """Appends no longer invalidate the sketch: the new rows are sketched
    against the existing basis in place (per-row bound stays rigorous), so
    queries keep the certified path mid-ingest. The appended row must be
    FINDABLE immediately — the exact failure a stale sketch would cause."""
    n, k = 4_000, 10
    emb = concentrated(rng, n)
    idx = VectorIndex(DIM)
    idx.add([f"p{i}" for i in range(n)], emb)
    idx.build_sketch()
    assert idx.sketch_fresh
    # append a row that must WIN: equal to the query itself
    q = concentrated(rng, 1)
    idx.add(["new"], q.copy())
    assert idx.sketch_fresh  # absorbed incrementally, no rebuild
    assert idx.sketch_incremental == 1
    got = idx.search_twostage(q, k, candidates=256)
    want = idx.search(q, k)
    assert got[1][0, 0] == n  # the new row is rank 1
    assert_same_answer(got, want)


def test_incremental_sketch_across_new_slab(rng):
    """Appends that allocate a NEW slab grow the sketch tuple to match and
    stay exact (the sketch slab list must mirror the emb slab list)."""
    n, k = 4_096, 10
    idx = VectorIndex(DIM, slab_rows=4_096)  # force one slab per 4096 rows
    idx.add([f"p{i}" for i in range(n)], concentrated(rng, n))
    idx.build_sketch()
    extra = concentrated(rng, 6_000)
    idx.add([f"x{i}" for i in range(6_000)], extra)
    assert len(idx._emb_slabs) > 1
    assert idx.sketch_fresh and idx.sketch_incremental == 1
    assert len(idx._sketch.sketches) == len(idx._emb_slabs)
    q = (extra[-1:] + 0.0).astype(np.float32)
    got = idx.search_twostage(q, k, candidates=256)
    want = idx.search(q, k)
    assert got[1][0, 0] == n + 6_000 - 1
    assert_same_answer(got, want)


def test_incremental_sketch_bf16_and_int8(rng):
    """Incremental update preserves the sketch dtype and the int8 bitwise
    contract; the bf16 ub_slack only grows (max over old + new rows)."""
    n, k = 8_000, 20
    idx = VectorIndex(DIM, quantize="int8")
    idx.add([f"p{i}" for i in range(n)], concentrated(rng, n))
    idx.build_sketch(dtype="bfloat16")
    import jax.numpy as jnp

    slack0 = float(idx._sketch.ub_slack)
    assert idx._sketch.sketches[0].dtype == jnp.bfloat16
    idx.add([f"x{i}" for i in range(500)], concentrated(rng, 500))
    assert idx.sketch_fresh
    assert idx._sketch.sketches[0].dtype == jnp.bfloat16
    assert float(idx._sketch.ub_slack) >= slack0
    q = concentrated(rng, 2)
    got = idx.search_twostage(q, k, candidates=512)
    want = idx.search(q, k)
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])


def test_incremental_sketch_mesh_falls_back_to_invalidate(rng):
    """Sharded sketches keep the invalidate-and-rebuild path (the in-place
    splice is not implemented for P(data, None) sketch slabs)."""
    from image_search_tpu.parallel.mesh import make_mesh

    n, k = 8_192, 10
    idx = VectorIndex(DIM, mesh=make_mesh(8, 1), quantize="int8")
    idx.add([f"p{i}" for i in range(n)], concentrated(rng, n))
    idx.build_sketch()
    assert idx.sketch_fresh
    q = concentrated(rng, 1)
    idx.add(["new"], q.copy())
    assert not idx.sketch_fresh and idx.sketch_incremental == 0
    got = idx.search_twostage(q, k)  # stale -> full scan, still exact
    assert got[1][0, 0] == n
    idx.build_sketch()  # rebuild restores the certified path
    got2 = idx.search_twostage(q, k, candidates=256)
    assert got2[1][0, 0] == n


def test_tombstones_never_surface(rng):
    n, k = 8_000, 20
    emb = concentrated(rng, n)
    idx = VectorIndex(DIM, quantize="int8")
    idx.add([f"p{i}" for i in range(n)], emb)
    # query equals row 7 exactly -> it would be rank 1; remove it
    q = emb[7:8].copy()
    idx.remove_paths(["p7"])
    idx.build_sketch()
    got_s, got_i = idx.search_twostage(q, k, candidates=256)
    assert idx.twostage_certified == 1
    assert 7 not in got_i[0]
    want_s, want_i = idx.search(q, k)
    np.testing.assert_array_equal(got_i, want_i)
    np.testing.assert_array_equal(got_s, want_s)


def test_empty_and_sketchless_fall_back(rng):
    idx = VectorIndex(DIM)
    s, i = idx.search_twostage(np.zeros((1, DIM), np.float32), 5)
    assert s.shape == (1, 0)  # empty index contract matches search()
    emb = flat(rng, 100)
    idx.add([f"p{i}" for i in range(100)], emb)
    # no sketch built -> plain full scan, same answer
    q = flat(rng, 1)
    got = idx.search_twostage(q, 5)
    want = idx.search(q, 5)
    assert_same_answer(got, want)
    assert idx.twostage_fallbacks >= 1


def test_k_covering_whole_corpus_falls_back(rng):
    """size == padded capacity and k >= size: the candidate cap
    c = n_pad - 1 < k cannot yield k rows — must fall back to the full
    scan, not crash inside jax.lax.top_k (round-3 review finding)."""
    n = 4096  # exactly one allocation granule: size == n_pad
    emb = concentrated(rng, n)
    idx = VectorIndex(DIM, min_capacity=n)
    idx.add([f"p{i}" for i in range(n)], emb)
    assert idx.capacity == n  # precondition: no padding slack
    idx.build_sketch()
    q = concentrated(rng, 1)
    got = idx.search_twostage(q, k=10_000)  # clamps to size = n_pad
    want = idx.search(q, k=10_000)
    assert idx.twostage_fallbacks == 1
    assert_same_answer(got, want)


def test_search_many_batched_twostage(tmp_path, rng):
    """Micro-batches — plain AND feedback — must ride the two-stage path
    (the flag used to be silently inert for batched traffic); answers
    match the full scan either way."""
    import os

    from PIL import Image

    from image_search_tpu.server.args import ServerArgs
    from image_search_tpu.server.engine import SearchEngine

    media = str(tmp_path / "pics")
    os.makedirs(media)
    for i in range(6):
        arr = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(media, f"i{i}.jpg"))
    args = ServerArgs(
        model_weights=str(tmp_path / "missing.st"),
        model="clip-tiny-test",
        media_dir=media,
        index_dir=str(tmp_path / "idx"),
        search_twostage=True,
    )
    eng = SearchEngine(args)
    eng.scan()
    before = eng.index.twostage_certified + eng.index.twostage_fallbacks
    res = eng.search_many(["a photo", "another photo", "a third"], None, k=4)
    assert len(res) == 3 and all(len(r) == 4 for r in res)
    assert eng.index.twostage_certified + eng.index.twostage_fallbacks == before + 1
    # same queries through the full-scan batch program agree
    want = eng.search_many(["a photo"], [[]], k=4)  # plain, twostage again
    full = eng.index.search_with_feedback_batch(
        eng._cached_text_embed("a photo"), [[]], 4
    )
    assert [r["image_path"] for r in want[0]] == [
        eng._wire_row(int(i))["image_path"] for i in np.asarray(full[1])[0]
    ]
    # a batch containing feedback rides the two-stage path too (the
    # Rocchio query is just another query vector) and matches the fused
    # full feedback program
    after = eng.index.twostage_certified + eng.index.twostage_fallbacks
    sel = [[res[0][0]["image_path"]], []]
    res_fb = eng.search_many(["a photo", "x"], sel, k=4)
    assert len(res_fb) == 2
    assert eng.index.twostage_certified + eng.index.twostage_fallbacks == after + 1
    abs_sel = [[eng.to_abs_path(p) for p in s] for s in sel]
    full_fb = eng.index.search_with_feedback_batch(
        np.stack([
            np.asarray(eng._cached_text_embed("a photo")),
            np.asarray(eng._cached_text_embed("x")),
        ]),
        abs_sel,
        4,
    )
    want_paths = [
        [eng._wire_row(int(i))["image_path"] for i in row]
        for row in np.asarray(full_fb[1])
    ]
    assert [[r["image_path"] for r in row] for row in res_fb] == want_paths


def test_search_many_fused_one_program(tmp_path, rng, monkeypatch):
    """Cold micro-batches ride the ONE-program fused serving path (round-3
    verdict #1): token ids -> text tower -> Rocchio -> certified two-stage
    in a single dispatched XLA program. It must actually SERVE (the
    ``fused_searches`` counter moves — not silently fall back to the
    two-program path), its answers must equal the classic path's, and the
    embeddings it computes must land in the text cache so the warm repeat
    runs zero tower work.

    The fused program is the SINGLE-CHIP serving deployment (a meshed
    engine keeps the two-program path: DP tower + sharded search), so the
    engine is built mesh-less — under the test env's 8 virtual devices it
    would otherwise auto-mesh."""
    import os

    from PIL import Image

    import image_search_tpu.server.engine as engine_mod
    from image_search_tpu.server.args import ServerArgs
    from image_search_tpu.server.engine import SearchEngine
    from image_search_tpu.utils.metrics import global_metrics

    monkeypatch.setattr(engine_mod, "make_mesh", lambda *a, **k: None)
    media = str(tmp_path / "pics")
    os.makedirs(media)
    for i in range(4):
        arr = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(media, f"i{i}.jpg"))
    args = ServerArgs(
        model_weights=str(tmp_path / "missing.st"),
        model="clip-tiny-test",
        media_dir=media,
        index_dir=str(tmp_path / "idx"),
        search_twostage=True,
    )
    eng = SearchEngine(args)
    eng.scan()
    # grow the corpus past block granularity with synthetic rows (the 4
    # real images alone cannot fill one 128-row block), in the engine's
    # own projection dim, with the low-rank spectral shape that certifies
    n, d = 16_384, eng.index.dim
    m = rng.normal(size=(RANK, d))
    x = rng.normal(size=(n, RANK)) @ m + 0.02 * rng.normal(size=(n, d))
    emb = (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)
    eng.index.add([os.path.join(media, f"s{i}.jpg") for i in range(n)], emb)
    eng.index.build_sketch()

    def fused_count():
        return global_metrics.snapshot()["counters"].get("fused_searches", 0)

    before = fused_count()
    queries = ["a red photo", "blue"]
    res = eng.search_many(queries, None, k=50)
    assert fused_count() == before + 2  # the fused program answered
    assert len(res) == 2 and all(len(r) == 50 for r in res)
    # warm repeat: cache hits -> classic path on the embeddings the fused
    # program cached. Answers must be identical (both exact)
    res2 = eng.search_many(queries, None, k=50)
    assert fused_count() == before + 2  # warm traffic never re-fuses
    assert [[r["image_path"] for r in row] for row in res2] == [
        [r["image_path"] for r in row] for row in res
    ]
    # cold queries WITH feedback ride the fused program too; oracle = the
    # full-scan feedback batch on the (now cached) fused embeddings
    sel = [[res[0][0]["image_path"]], []]
    res_fb = eng.search_many(["green thing", "yellow"], sel, k=50)
    assert fused_count() == before + 4
    abs_sel = [[eng.to_abs_path(p) for p in s] for s in sel]
    full_fb = eng.index.search_with_feedback_batch(
        np.stack([
            np.asarray(eng._cached_text_embed("green thing")),
            np.asarray(eng._cached_text_embed("yellow")),
        ]),
        abs_sel,
        50,
    )
    want_paths = [
        [eng._wire_row(int(i))["image_path"] for i in row]
        for row in np.asarray(full_fb[1])
    ]
    assert [[r["image_path"] for r in row] for row in res_fb] == want_paths


@pytest.mark.parametrize("quantize", [None, "int8"])
def test_feedback_twostage_matches_fused_feedback(rng, quantize):
    """Rocchio feedback through the certified two-stage path: certified
    answers equal the fused full-scan feedback program's; empty selections
    equal the plain two-stage search bitwise."""
    n, k, c = 20_000, 100, 512
    emb = concentrated(rng, n)
    idx = VectorIndex(DIM, quantize=quantize)
    paths = [f"p{i}" for i in range(n)]
    idx.add(paths, emb)
    idx.build_sketch()
    q = concentrated(rng, 2)
    sels = [[paths[3], paths[17], paths[400]], [paths[8]]]
    want = idx.search_with_feedback_batch(q, sels, k)
    got = idx.search_twostage_feedback_batch(q, sels, k, candidates=c)
    assert idx.twostage_certified == 1 and idx.twostage_fallbacks == 0
    if quantize == "int8":
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])
    else:
        assert_same_answer(got, want)
    # empty selections == the plain two-stage search bitwise
    got_plain = idx.search_twostage_feedback_batch(q, [[], []], k, candidates=c)
    want_plain = idx.search_twostage(q, k, candidates=c)
    np.testing.assert_array_equal(got_plain[0], want_plain[0])
    np.testing.assert_array_equal(got_plain[1], want_plain[1])
    # unknown selection paths are dropped (reference WHERE-IN semantics)
    got_unknown = idx.search_twostage_feedback_batch(
        q, [["nope"], []], k, candidates=c
    )
    np.testing.assert_array_equal(got_unknown[0], want_plain[0])


def test_feedback_twostage_flat_falls_back_exact(rng):
    n, k = 16_000, 50
    emb = flat(rng, n)
    idx = VectorIndex(DIM)
    paths = [f"p{i}" for i in range(n)]
    idx.add(paths, emb)
    idx.build_sketch()
    q = flat(rng, 2)
    sels = [[paths[1]], []]
    want = idx.search_with_feedback_batch(q, sels, k)
    # candidates small vs the corpus: the default budget would clamp to
    # near-full block coverage, which certifies legitimately on any data
    got = idx.search_twostage_feedback_batch(q, sels, k, candidates=8)
    assert idx.twostage_fallbacks == 1 and idx.twostage_certified == 0
    assert_same_answer(got, want)


def test_sharded_feedback_twostage_matches(rng):
    from image_search_tpu.parallel import make_mesh

    n, k, c = 16_384, 50, 512
    emb = concentrated(rng, n)
    idx = VectorIndex(DIM, mesh=make_mesh(8, 1), quantize="int8")
    paths = [f"p{i}" for i in range(n)]
    idx.add(paths, emb)
    idx.build_sketch()
    q = concentrated(rng, 2)
    sels = [[paths[5], paths[123]], []]
    want = idx.search_with_feedback_batch(q, sels, k)
    got = idx.search_twostage_feedback_batch(q, sels, k, candidates=c)
    assert idx.twostage_certified == 1 and idx.twostage_fallbacks == 0
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])


@pytest.mark.parametrize("quantize", [None, "int8"])
def test_bf16_sketch_certified_exact(rng, quantize):
    """bfloat16 sketch storage (halved stage-1 bytes): the rounding cost
    is folded into the data-derived ub_slack, so certified answers must
    STILL equal the full scan bitwise."""
    n, k, c = 20_000, 100, 512
    emb = concentrated(rng, n)
    idx = VectorIndex(DIM, quantize=quantize)
    idx.add([f"p{i}" for i in range(n)], emb)
    idx.build_sketch(dtype="bfloat16")
    import jax.numpy as jnp

    assert idx._sketch.sketches[0].dtype == jnp.bfloat16
    assert float(idx._sketch.ub_slack) > 0.0
    q = concentrated(rng, 3)
    want = idx.search(q, k)
    got = idx.search_twostage(q, k, candidates=c)
    assert idx.twostage_certified == 1 and idx.twostage_fallbacks == 0
    if quantize == "int8":
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])
    else:
        assert_same_answer(got, want)
    # f32 sketches carry zero inflation
    idx.build_sketch()
    assert float(idx._sketch.ub_slack) == 0.0


def test_bf16_sketch_bound_is_valid_everywhere(rng):
    """Property behind the certificate: for EVERY row, the bf16-sketch
    upper bound (with its inflation) dominates the exact score — on data
    with NO helpful spectrum, and checked against adversarial queries."""
    import jax.numpy as jnp

    from image_search_tpu.index import twostage

    n = 4_096
    emb = flat(rng, n)  # worst case for tightness; validity must not care
    idx = VectorIndex(DIM, quantize="int8")
    idx.add([f"p{i}" for i in range(n)], emb)
    idx.build_sketch(dtype="bfloat16")
    sk = idx._sketch
    slabs, _, scales, _ = idx._snapshot()
    q = np.concatenate([flat(rng, 4), emb[:4]])  # incl. exact-row queries
    qj = jnp.asarray(q)
    from image_search_tpu.index.index import _l2
    from image_search_tpu.index.twostage import (
        SLACK, SLACK_T, _exact_query_vector)

    qn = _l2(qj)
    qt_vec, qi, qs = _exact_query_vector(qn, True)
    q_s = qt_vec @ sk.basis
    qs2 = jnp.sum(q_s * q_s, 1)
    q_res = jnp.sqrt(
        jnp.maximum(jnp.sum(qt_vec * qt_vec, 1) - qs2, 0.0) + SLACK_T
    )
    infl = jnp.sqrt(qs2) * sk.ub_slack + SLACK
    dot = jnp.asarray(
        np.asarray(q_s.astype(jnp.bfloat16), np.float32)
        @ np.asarray(sk.sketches[0], np.float32).T
    )
    ub = dot + q_res[:, None] * sk.resid[0][None, :] + infl[:, None]
    # exact scores of every live row (same arithmetic as the full scan)
    exact = twostage._rescore_int8(
        slabs, scales, jnp.broadcast_to(jnp.arange(n)[None, :], (len(q), n)),
        qi, qs,
    )
    assert bool(jnp.all(ub[:, :n] >= exact))


def test_bf16_bound_survives_rounding_midpoints():
    """Adversarial construction for the bf16 query-cast term (round-3
    review): bf16 has p=8 significant bits, so round-to-nearest relative
    error is up to 2^-8 — components sitting just below rounding midpoints
    lose ~2^-8 RELATIVE each, and an inflation constant of 2^-9 (eps/2
    confused with eps) under-covers the dot shortfall and certifies wrong
    answers. The bound must dominate the exact score even here."""
    import jax.numpy as jnp

    from image_search_tpu.index.twostage import SLACK, SLACK_T, _sketch_chunk

    d_s = 64
    basis = np.zeros((DIM, d_s), np.float32)
    basis[:d_s, :d_s] = np.eye(d_s, dtype=np.float32)
    # 63 components just BELOW the first bf16 midpoint in [0.125, 0.25)
    # (grid spacing 2^-10, midpoint 0.125 + 2^-11): each rounds DOWN with
    # relative error ~2^-8; the last component balances to unit norm
    t = 0.125 + 2.0 ** -11 - 2.0 ** -18
    u = np.full(d_s, t, np.float32)
    u[-1] = np.sqrt(1.0 - 63 * t * t)
    row = np.zeros(DIM, np.float32)
    row[:d_s] = u  # unit row, fully inside the sketch subspace
    slab = jnp.asarray(row[None, :])

    s16, resid, slack = _sketch_chunk(slab, None, jnp.asarray(basis), True)
    q = jnp.asarray(row)  # query == row: exact cosine score is 1.0
    q_s = q @ jnp.asarray(basis)
    qs_norm = float(jnp.sqrt(jnp.sum(q_s * q_s)))
    q_res = float(jnp.sqrt(jnp.maximum(1.0 - qs_norm**2, 0.0) + SLACK_T))
    dot = float(
        jnp.asarray(q_s.astype(jnp.bfloat16), jnp.float32)
        @ jnp.asarray(s16, jnp.float32)[0]
    )
    ub = dot + q_res * float(resid[0]) + qs_norm * float(slack) + SLACK
    exact = float(q @ slab[0])
    # the raw bf16 dot really does undershoot by ~2^-7 combined — the
    # inflation must cover it
    assert dot < exact - 0.005
    assert ub >= exact, (ub, exact, dot, float(slack))


def test_sharded_bf16_sketch_certified_exact(rng):
    """The mesh-sharded UB pass honors the bf16 inflation too."""
    from image_search_tpu.parallel import make_mesh

    n, k, c = 16_384, 50, 512
    emb = concentrated(rng, n)
    idx = VectorIndex(DIM, mesh=make_mesh(8, 1), quantize="int8")
    idx.add([f"p{i}" for i in range(n)], emb)
    idx.build_sketch(dtype="bfloat16")
    assert float(idx._sketch.ub_slack) > 0.0
    q = concentrated(rng, 3)
    want = idx.search(q, k)
    got = idx.search_twostage(q, k, candidates=c)
    assert idx.twostage_certified == 1 and idx.twostage_fallbacks == 0
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])


@pytest.mark.parametrize("quantize", [None, "int8"])
def test_sharded_twostage_matches_sharded_full_scan(rng, quantize):
    """Mesh-sharded two-stage (per-shard UB pass + local rescore +
    all_gather merge) must equal the full sharded scan; on the
    concentrated corpus the certificate holds so no fallback runs."""
    from image_search_tpu.parallel import make_mesh

    n, k, c = 16_384, 50, 512
    emb = concentrated(rng, n)
    idx = VectorIndex(DIM, mesh=make_mesh(8, 1), quantize=quantize)
    idx.add([f"p{i}" for i in range(n)], emb)
    idx.build_sketch()
    assert idx.sketch_fresh
    q = concentrated(rng, 3)
    want = idx.search(q, k)
    got = idx.search_twostage(q, k, candidates=c)
    assert idx.twostage_certified == 1 and idx.twostage_fallbacks == 0
    if quantize == "int8":
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])
    else:
        assert_same_answer(got, want)
    # tombstoned rows must not surface through the sharded UB pass either
    top = int(want[1][0, 0])
    idx.remove_paths([f"p{top}"])
    idx.build_sketch()
    got_s, got_i = idx.search_twostage(q, k, candidates=c)
    assert top not in got_i[0]
    want_s, want_i = idx.search(q, k)
    np.testing.assert_array_equal(got_i, want_i)


def test_sharded_twostage_flat_corpus_falls_back(rng):
    """Flat spectrum defeats the bound on the sharded path too: the
    certificate fails, the full sharded scan answers, result exact."""
    from image_search_tpu.parallel import make_mesh

    n, k = 16_384, 50
    emb = flat(rng, n)
    idx = VectorIndex(DIM, mesh=make_mesh(8, 1))
    idx.add([f"p{i}" for i in range(n)], emb)
    idx.build_sketch()
    q = flat(rng, 2)
    want = idx.search(q, k)
    got = idx.search_twostage(q, k, candidates=k + 16)
    assert idx.twostage_fallbacks == 1 and idx.twostage_certified == 0
    assert_same_answer(got, want)


@pytest.mark.parametrize("sketch_dtype", ["float32", "bfloat16"])
def test_engine_flag_wires_twostage(tmp_path, rng, sketch_dtype):
    """--search-twostage: scan builds the sketch (in --sketch-dtype), plain
    searches ride the certified path, feedback searches keep the fused
    full path."""
    import os

    from PIL import Image

    from image_search_tpu.server.args import ServerArgs
    from image_search_tpu.server.engine import SearchEngine

    media = str(tmp_path / "pics")
    os.makedirs(media)
    for i in range(5):
        arr = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(media, f"i{i}.jpg"))
    args = ServerArgs(
        model_weights=str(tmp_path / "missing.st"),
        model="clip-tiny-test",
        media_dir=media,
        index_dir=str(tmp_path / "idx"),
        search_twostage=True,
        sketch_dtype=sketch_dtype,
    )
    eng = SearchEngine(args)
    eng.scan()
    assert eng.index.sketch_fresh  # rebuilt at scan end
    import jax.numpy as jnp

    want_dt = jnp.bfloat16 if sketch_dtype == "bfloat16" else jnp.float32
    assert eng.index._sketch.sketches[0].dtype == want_dt
    res = eng.search("anything", [])
    assert len(res) == 5
    assert eng.index.twostage_certified + eng.index.twostage_fallbacks == 1
    # feedback path unaffected
    res2 = eng.search("anything", [res[0]["image_path"]])
    assert res2[0]["image_path"] == res[0]["image_path"]
    # a fresh engine on the same store builds the sketch at startup
    eng2 = SearchEngine(args)
    assert eng2.index.sketch_fresh


def test_warmup_probes_do_not_trip_adaptive_disable(rng):
    """Serving warmup probes the two-stage programs with zero queries and
    count_failures=False: on a corpus larger than the candidate budget the
    zero query's certificate fails by construction, and those failures
    must neither advance nor wipe the adaptive-disable counter (round-3
    review: warmup with >=8 buckets could disable the sketch mid-loop; a
    post-loop reset conversely erased genuine live failures)."""
    # n >> c*BLOCK so block coverage stays partial and the zero query
    # CANNOT certify (full-coverage rescore certifies on any data)
    n, k, c = 8_000, 20, 8
    emb = flat(rng, n)
    idx = VectorIndex(DIM)
    idx.add([f"p{i}" for i in range(n)], emb)
    idx.build_sketch()
    idx._twostage_consec_failures = VectorIndex.TWOSTAGE_DISABLE_AFTER - 1
    z = np.zeros((8, DIM), np.float32)
    before_fb = idx.twostage_fallbacks
    idx.search_twostage(z, k, candidates=c, count_failures=False)
    idx.search_twostage_feedback_batch(
        z, [[] for _ in range(8)], k, candidates=c, count_failures=False
    )
    assert idx.twostage_fallbacks == before_fb + 2  # still visible as falls
    assert (
        idx._twostage_consec_failures
        == VectorIndex.TWOSTAGE_DISABLE_AFTER - 1
    )  # untouched: not advanced, not wiped
    assert idx.sketch_fresh  # never disabled mid-warmup
    # a genuine counted failure right after still trips the disable
    idx.search_twostage(flat(rng, 1), k, candidates=c)
    assert idx._sketch is None


def test_full_scan_slack_covers_default_precision_cast():
    """Round-3 soundness review: XLA's DEFAULT f32 dot on TPU rounds both
    operands to bf16 (relative error up to 2^-8 EACH — 40x SLACK), so the
    serving full scan's score of a non-candidate can rise ABOVE the
    real-arithmetic dot the UB bounds. FULL_SCAN_SLACK must dominate that
    rise. Adversarial construction: every component sits just ABOVE a bf16
    rounding midpoint, so both query and row round UP by ~2^-8 relative —
    the worst case for the certificate."""
    import jax.numpy as jnp

    from image_search_tpu.index.twostage import FULL_SCAN_SLACK

    d = 768
    # bf16 grid spacing in [0.03125, 0.0625) is 2^-12. Pick the grid point
    # nearest 1/sqrt(768) (so the vector is near-unit) and sit a hair above
    # its upward rounding midpoint: every component rounds UP with relative
    # error ~2^-8 — in BOTH operands, compounding to ~2^-7 on the dot
    t = 0.03125 + 19 * 2.0 ** -12 + 2.0 ** -13 + 2.0 ** -20
    v = np.full(d, t, np.float32)
    assert abs(np.linalg.norm(v) - 1.0) < 0.003  # near-unit by construction
    q = v.copy()
    r = v.copy()

    real = float(np.float64(q) @ np.float64(r))  # what the UB provably bounds

    q16 = np.asarray(jnp.asarray(q).astype(jnp.bfloat16), np.float32)
    r16 = np.asarray(jnp.asarray(r).astype(jnp.bfloat16), np.float32)
    sim_f32_slab = float(q16 @ r16)   # DEFAULT f32 dot: both operands cast
    sim_bf16_slab = float(q16 @ r16)  # bf16 slab: row already stored as r16

    # the adversarial rise is real (far beyond SLACK=1e-4)...
    assert sim_f32_slab - real > 2.0 ** -9
    # ...and the per-dtype certificate deduction covers it with the
    # reduction-error headroom intact
    assert sim_f32_slab - real < FULL_SCAN_SLACK["float32"] - 2e-4
    real_vs_stored = float(np.float64(q) @ np.float64(r16))
    assert sim_bf16_slab - real_vs_stored < FULL_SCAN_SLACK["bfloat16"] - 2e-4
    assert FULL_SCAN_SLACK["int8"] == 0.0  # integer dot is bitwise on both routes


def test_sharded_twostage_tiny_shards_huge_k_still_exact(rng):
    """Round-3 review found v1's sharded merge pool (n_shards * local_k)
    could hold FEWER than k rows and return a silently short result. The
    v2 block path floors local_m at ceil(k/BLOCK), so the pool can always
    hold k; at tiny per-shard row counts local_m clamps to FULL local
    coverage and the answer is certified-exact (every row rescored). The
    answer must have full [B, k] shape and equal the full scan either way;
    the kk<k fallback guard stays as a belt-and-braces backstop."""
    from image_search_tpu.parallel import make_mesh

    n = 4_096  # one append block -> 512 rows/shard on 8 devices
    k = 4_090  # v1's merged pool held only 8 * 511 = 4088 < k columns
    emb = concentrated(rng, n)
    idx = VectorIndex(DIM, mesh=make_mesh(8, 1))
    idx.add([f"p{i}" for i in range(n)], emb)
    idx.build_sketch()
    q = concentrated(rng, 2)
    want = idx.search(q, k)
    got = idx.search_twostage(q, k, candidates=k + 5)
    assert idx.twostage_certified == 1 and idx.twostage_fallbacks == 0
    assert got[0].shape == (2, k) and got[1].shape == (2, k)
    assert_same_answer(got, want)


def test_batched_union_no_duplicate_ids_with_identical_queries(rng):
    """B>1 uses the UNION of per-query block sets; identical queries make
    every per-query set identical (maximal overlap), so the gather holds
    each block B times — the duplicate-tile mask must keep exactly one
    copy or the top-k would return the same row id twice."""
    n, k = 20_000, 100
    emb = concentrated(rng, n)
    idx = VectorIndex(DIM)
    idx.add([f"p{i}" for i in range(n)], emb)
    idx.build_sketch()
    one = concentrated(rng, 1)
    q = np.repeat(one, 4, axis=0)  # 4 identical queries
    want = idx.search(q, k)
    got = idx.search_twostage(q, k, candidates=512)
    assert idx.twostage_certified == 1 and idx.twostage_fallbacks == 0
    for b in range(4):
        assert len(set(got[1][b].tolist())) == k, "duplicate row id in top-k"
    assert_same_answer(got, want)


def test_batched_union_distinct_clusters_certify(rng):
    """Distinct batched queries aimed at DISJOINT clusters: each query's
    hot blocks differ, so the union selection must guarantee every query
    its own m//B best blocks and certify each one (the batch-max shared
    set this replaced let one query hog the budget — measured never
    certifying at B=8 on the 10M corpus)."""
    n_half, k = 10_000, 50
    base_a = np.zeros(DIM); base_a[:RANK] = 1.0
    base_b = np.zeros(DIM); base_b[RANK:2 * RANK] = 1.0
    mk = lambda base: (
        base[None, :] + 0.05 * rng.normal(size=(n_half, DIM))
    ).astype(np.float32)
    emb = np.concatenate([mk(base_a), mk(base_b)])
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    idx = VectorIndex(DIM)
    idx.add([f"p{i}" for i in range(2 * n_half)], emb)
    idx.build_sketch()
    q = np.stack([base_a, base_b, base_a + 0.1, base_b + 0.1]).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    want = idx.search(q, k)
    got = idx.search_twostage(q, k, candidates=512)
    assert idx.twostage_certified == 1 and idx.twostage_fallbacks == 0
    assert_same_answer(got, want)


def test_batched_guard_falls_back_when_union_share_below_k(rng):
    """B>1: each query is guaranteed only m//B blocks of its own choice;
    if that share cannot hold k rows the caller must route to the full
    scan instead of risking a NEG_INF-padded pool."""
    n, k = 2_000, 1000
    emb = concentrated(rng, n)
    idx = VectorIndex(DIM)
    idx.add([f"p{i}" for i in range(n)], emb)
    idx.build_sketch()
    q = concentrated(rng, 16)
    want = idx.search(q, k)
    # padded slab 8192 -> nb = 64 blocks -> m = 63 (c floors at k but
    # clamps to nb-1); m*BLOCK = 8064 >= k passes the solo guard, yet
    # m//16 = 3 blocks = 384 rows < k per-query union share
    got = idx.search_twostage(q, k, candidates=16)
    assert idx.twostage_fallbacks == 1 and idx.twostage_certified == 0
    assert_same_answer(got, want)


def test_share_splits_union_by_real_queries_not_pad_copies(rng):
    """Serving pads coalesced batches to the Bpad=8 bucket by REPEATING
    query 0; with share=1 the kernel must give that one real query its
    FULL m-block budget (identical answer+certificate to the solo B=1
    call), not m//8 of it. share=0 keeps the per-row split (direct API)."""
    import jax.numpy as jnp

    from image_search_tpu.index import twostage
    from image_search_tpu.index.index import VectorIndex

    # query drawn from the SAME subspace as the corpus (one concentrated
    # draw, last row as query): partial-coverage certification needs the
    # query's similarity curve to decay, which a foreign-subspace query
    # doesn't give. m=128 of nb=512 blocks = 25% coverage, verified to
    # certify solo.
    n, k, m = 65_536, 50, 128
    both = concentrated(rng, n + 1)
    emb, q_np = both[:n], both[n:]
    idx = VectorIndex(DIM)
    idx.add([f"p{i}" for i in range(n)], emb)
    idx.build_sketch()
    sk = idx._sketch
    slabs, _, scales, pens = idx._snapshot()
    size = jnp.asarray(idx._size, jnp.int32)
    q1 = jnp.asarray(q_np)
    q8 = jnp.broadcast_to(q1, (8, DIM))

    v1, i1, c1 = twostage.twostage_topk_block(
        slabs, sk.sketches, sk.resid, sk.basis, size, q1, k, m,
        scales, pens, sk.ub_slack,
    )
    v8, i8, c8 = twostage.twostage_topk_block(
        slabs, sk.sketches, sk.resid, sk.basis, size, q8, k, m,
        scales, pens, sk.ub_slack, share=1,
    )
    np.testing.assert_array_equal(np.asarray(i8[:1]), np.asarray(i1))
    # same blocks, same rows; scores may differ by f32 reduction order
    # across batch shapes (XLA tiles the [B, m*128] einsum differently)
    np.testing.assert_allclose(np.asarray(v8[:1]), np.asarray(v1), atol=1e-6)
    assert bool(c8[0]) == bool(c1[0]) is True
    # share=0 (per-row split) gives each of the 8 rows only m//8 = 3
    # blocks' own pick; certificates may differ — the pad-aware share is
    # what keeps serving's padded single query as tight as a solo call
    np.testing.assert_array_equal(np.asarray(i8[1:]), np.asarray(i8[:1]).repeat(7, 0))


def test_per_slab_quota_multi_slab_batched(rng):
    """Round-4: block selection+gather run per slab (static quota m_i
    proportional to the slab's block count) so gather traffic is ~m blocks
    TOTAL regardless of slab count — a multi-slab index serving a batch of
    DISTINCT queries must still answer exactly AND certify (per-slab union
    shares add up to the per-query guarantee)."""
    n, k = 16_384, 20
    both = concentrated(rng, n + 4)
    emb, q_np = both[:n], both[n:]
    idx = VectorIndex(DIM, slab_rows=4_096)  # slabs double: 4096 + 12288
    idx.add([f"p{i}" for i in range(n)], emb)
    idx.build_sketch()
    assert len(idx._emb_slabs) >= 2
    want = idx.search(q_np, k)
    # c=96 -> m=96 of 127 blocks split ~proportionally over the slabs;
    # share=4 -> each query owns ~24 blocks = 3072 rows >= k. (At c=64 the
    # distinct-4 batch is marginal for BOTH constructions: the round-3
    # global selection certified 1/4, per-slab quotas 2/4 — small per-slab
    # shares have hypergeometric variance on a 2-slab corpus. At 10M scale
    # hot blocks scatter uniformly over slabs and the quota costs nothing.)
    got = idx.search_twostage(q_np, k, candidates=96)
    assert idx.twostage_certified == 1 and idx.twostage_fallbacks == 0
    assert_same_answer(got, want)


# -- build-time certifiability gate (round-3 verdict #7) ----------------------


def test_certifiable_estimate_separates_flat_from_concentrated(rng):
    """The build-time estimator must read ~0 on a flat corpus and ~1 on a
    concentrated one (same spectra the serving gate decides between)."""
    from image_search_tpu.index import twostage

    n = 4096
    for gen, lo, hi in ((flat, 0.0, 0.05), (concentrated, 0.9, 1.0)):
        x = gen(rng, n)
        basis = twostage.fit_basis(x[:2048], 64)
        est = twostage.estimate_certifiable_fraction(
            x, basis, corpus_size=10_000_000, k=1000,
            candidate_rows=twostage.DEFAULT_BLOCKS * twostage.BLOCK,
            fs_slack=0.0,
        )
        assert lo <= est <= hi, (gen.__name__, est)


def test_gate_refuses_flat_sketch_and_queries_skip_bound_pass(rng):
    """With min_certifiable, a flat corpus never publishes a sketch: no
    doomed ~40 ms bound passes before adaptive disable — queries go
    straight to the (exact) full scan. A concentrated corpus publishes
    and certifies as before."""
    n, k = 20_000, 50
    emb = flat(rng, n)
    idx = VectorIndex(DIM)
    idx.add([f"p{i}" for i in range(n)], emb)
    idx.build_sketch(min_certifiable=0.5)
    assert not idx.sketch_fresh          # refused
    assert idx.twostage_gate_skips == 1
    assert idx.sketch_certifiable_est is not None
    assert idx.sketch_certifiable_est < 0.5
    q = flat(rng, 2)
    got = idx.search_twostage(q, k)      # no sketch: straight full scan
    assert idx._twostage_consec_failures == 0  # no certificate was risked
    assert_same_answer(got, idx.search(q, k))

    idx2 = VectorIndex(DIM)
    idx2.add([f"c{i}" for i in range(n)], concentrated(rng, n))
    idx2.build_sketch(min_certifiable=0.5)
    assert idx2.sketch_fresh             # published
    assert idx2.sketch_certifiable_est >= 0.5
    q2 = concentrated(rng, 2)
    got2 = idx2.search_twostage(q2, k, candidates=512)
    assert idx2.twostage_certified == 1
    assert_same_answer(got2, idx2.search(q2, k))
