"""Sketch-accelerated duplicate scan (index/dupscan.py + ops/blockmax.py):
the pair list must be COMPLETE and certified against a brute-force oracle
on the dequantized stored rows — the sketch only decides how many block
pairs get rescored, never which pairs are emitted.

Guarantee under test (dupscan module docstring): every pair with true dot
>= threshold + band is emitted, none below threshold - band, band ~2e-4.
"""

import numpy as np
import pytest

from image_search_tpu.index import dupscan
from image_search_tpu.index.dupscan import DupScanBailout
from image_search_tpu.index.index import VectorIndex

DIM = 256
RANK = 32
BAND = 5e-4  # test-side guarantee band (module promises ~2e-4)


def concentrated(rng, n, noise=0.02):
    m = rng.normal(size=(RANK, DIM))
    x = rng.normal(size=(n, RANK)) @ m + noise * rng.normal(size=(n, DIM))
    return (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)


def flat(rng, n):
    x = rng.normal(size=(n, DIM))
    return (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)


def plant_dups(rng, emb, n_pairs, noise=0.01):
    """Overwrite rows so that (2p, 2p+1) are near-duplicates, p < n_pairs."""
    emb = emb.copy()
    for p in range(n_pairs):
        v = emb[2 * p] + noise * rng.normal(size=DIM).astype(np.float32)
        emb[2 * p + 1] = (v / np.linalg.norm(v)).astype(np.float32)
    return emb


def oracle_pairs(stored, threshold, live=None):
    """Brute-force f64 pair set on the rows the index actually scores."""
    g = stored.astype(np.float64) @ stored.astype(np.float64).T
    iu, ju = np.triu_indices(len(stored), k=1)
    s = g[iu, ju]
    keep = s >= threshold
    if live is not None:
        keep &= live[iu] & live[ju]
    return {(int(i), int(j)): float(v) for i, j, v in
            zip(iu[keep], ju[keep], s[keep])}


def check_band(got, stored, threshold, live=None):
    """got pairs vs oracle: completeness above +band, soundness below -band,
    and emitted scores match the true dot."""
    oracle = oracle_pairs(stored, threshold - BAND, live)
    must = {k for k, v in oracle.items() if v >= threshold + BAND}
    got_d = {(i, j): s for i, j, s in got}
    assert set(got_d) >= must, f"missing pairs: {sorted(must - set(got_d))[:5]}"
    assert set(got_d) <= set(oracle), (
        f"spurious pairs: {sorted(set(got_d) - set(oracle))[:5]}"
    )
    for k, s in got_d.items():
        assert abs(s - oracle[k]) < 2e-4, (k, s, oracle[k])


def dequantized(idx):
    """The rows the index scores (== stored rows, dequantized)."""
    import jax.numpy as jnp
    from image_search_tpu.index.index import _gather_rows

    slabs, _, scales, _ = idx._snapshot()
    rows = _gather_rows(slabs, scales, jnp.arange(len(idx), dtype=jnp.int32))
    return np.asarray(rows, np.float32)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize("quantize", [None, "int8"])
def test_complete_pairs_match_oracle(rng, quantize):
    n, n_dups = 6_000, 40
    emb = plant_dups(rng, concentrated(rng, n), n_dups)
    idx = VectorIndex(DIM, quantize=quantize)
    idx.add([f"p{i}" for i in range(n)], emb)
    idx.build_sketch()
    pairs = idx.find_near_duplicates_sketch(threshold=0.95)
    stored = dequantized(idx)
    check_band(pairs, stored, 0.95)
    # the planted pairs are the point of the scan: all recovered
    got = {(i, j) for i, j, _ in pairs}
    planted = {
        (2 * p, 2 * p + 1)
        for p in range(n_dups)
        if float(stored[2 * p] @ stored[2 * p + 1]) >= 0.95 + BAND
    }
    assert planted, "fixture produced no above-threshold planted pairs"
    assert planted <= got


def test_not_truncated_unlike_legacy(rng):
    """A 40-row duplicate cluster: the legacy scan truncates to `neighbors`
    per row; the sketch scan must emit ALL 780 pairs."""
    n, csize = 4_000, 40
    emb = concentrated(rng, n)
    base = emb[0]
    for i in range(csize):
        v = base + 0.005 * rng.normal(size=DIM).astype(np.float32)
        emb[i] = v / np.linalg.norm(v)
    idx = VectorIndex(DIM)
    idx.add([f"p{i}" for i in range(n)], emb)
    idx.build_sketch()
    pairs = idx.find_near_duplicates_sketch(threshold=0.99)
    cluster = {(i, j) for i, j, _ in pairs if i < csize and j < csize}
    assert len(cluster) == csize * (csize - 1) // 2
    legacy = idx.find_near_duplicates(threshold=0.99, neighbors=8)
    assert len({(i, j) for i, j, _ in legacy if i < csize and j < csize}) < len(cluster)


def test_flat_corpus(rng):
    """Flat corpus, high threshold: the augmented per-pair bound (s.s +
    t.t, blockmax.py) still prunes because t_i*t_j < threshold for every
    pair — the scan completes and must match the oracle (here: empty).
    At a threshold BELOW the residual product nothing can prune and the
    budget bailout must fire."""
    n = 8_192
    idx = VectorIndex(DIM)
    idx.add([f"p{i}" for i in range(n)], flat(rng, n))
    idx.build_sketch()
    pairs = idx.find_near_duplicates_sketch(threshold=0.95)
    check_band(pairs, dequantized(idx), 0.95)
    with pytest.raises(DupScanBailout):
        idx.find_near_duplicates_sketch(threshold=0.5)


def test_threshold_below_slack_refused(rng):
    idx = VectorIndex(DIM)
    idx.add([f"p{i}" for i in range(512)], concentrated(rng, 512))
    idx.build_sketch()
    with pytest.raises(DupScanBailout):
        idx.find_near_duplicates_sketch(threshold=1e-5)


def test_stale_or_missing_sketch_bails_out(rng):
    idx = VectorIndex(DIM)
    idx.add([f"p{i}" for i in range(512)], concentrated(rng, 512))
    with pytest.raises(DupScanBailout):  # never built
        idx.find_near_duplicates_sketch()
    idx.build_sketch()
    # appends are absorbed by the incremental sketch update — the scan
    # must still see the new row: make it a duplicate of row 3
    v = np.asarray(dequantized(idx)[3])
    idx.add(["extra"], v[None, :])
    assert idx.sketch_fresh and idx.sketch_incremental == 1
    assert (3, 512) in {(i, j) for i, j, _ in idx.find_near_duplicates_sketch(0.99)}
    # simulated staleness (e.g. a failed incremental update) must bail out
    idx._sketch = idx._sketch._replace(built_rows=idx._sketch.built_rows - 1)
    with pytest.raises(DupScanBailout):
        idx.find_near_duplicates_sketch()


def test_tombstoned_rows_excluded(rng):
    n, n_dups = 3_000, 20
    emb = plant_dups(rng, concentrated(rng, n), n_dups)
    idx = VectorIndex(DIM)
    idx.add([f"p{i}" for i in range(n)], emb)
    idx.remove_paths(["p0", "p5"])  # kills pairs (0,1) and (4,5)
    idx.build_sketch()
    pairs = idx.find_near_duplicates_sketch(threshold=0.95)
    rows = {i for p in pairs for i in p[:2]}
    assert 0 not in rows and 5 not in rows
    live = np.ones(n, bool)
    live[[0, 5]] = False
    check_band(pairs, dequantized(idx), 0.95, live)


def test_bf16_sketch_still_certified(rng):
    n, n_dups = 4_000, 25
    emb = plant_dups(rng, concentrated(rng, n), n_dups)
    idx = VectorIndex(DIM)
    idx.add([f"p{i}" for i in range(n)], emb)
    idx.build_sketch(dtype="bfloat16")
    pairs = idx.find_near_duplicates_sketch(threshold=0.95)
    check_band(pairs, dequantized(idx), 0.95)


def test_progress_monotone_and_complete(rng):
    n = 2_048
    emb = plant_dups(rng, concentrated(rng, n), 10)
    idx = VectorIndex(DIM)
    idx.add([f"p{i}" for i in range(n)], emb)
    idx.build_sketch()
    seen = []
    idx.find_near_duplicates_sketch(threshold=0.95,
                                    progress=lambda a, b: seen.append(a / b))
    assert seen and seen[-1] == 1.0 and seen == sorted(seen)


def test_multi_slab_corpus(rng):
    """Pairs that span slab boundaries must still be found."""
    n, slab = 5_000, 4_096  # slab_rows rounds up to the 4096-row granule
    emb = concentrated(rng, n)
    # duplicate across the slab boundary: row 100 (slab 0) ~ row 4500 (slab 1)
    v = emb[100] + 0.005 * rng.normal(size=DIM).astype(np.float32)
    emb[4_500] = (v / np.linalg.norm(v)).astype(np.float32)
    idx = VectorIndex(DIM, slab_rows=slab, min_capacity=slab)
    idx.add([f"p{i}" for i in range(n)], emb)
    assert len(idx._emb_slabs) > 1
    idx.build_sketch()
    pairs = {(i, j) for i, j, _ in idx.find_near_duplicates_sketch(0.99)}
    assert (100, 4_500) in pairs
    check_band(
        [(i, j, s) for i, j, s in idx.find_near_duplicates_sketch(0.99)],
        dequantized(idx), 0.99,
    )


def test_engine_routes_to_sketch_and_falls_back(rng, monkeypatch):
    """engine._duplicate_pairs: sketch route when fresh, legacy on bailout."""
    from image_search_tpu.server.engine import SearchEngine

    n = 2_048
    emb = plant_dups(rng, concentrated(rng, n), 8)
    idx = VectorIndex(DIM)
    idx.add([f"p{i}" for i in range(n)], emb)
    idx.build_sketch()
    assert idx.sketch_fresh

    eng = SearchEngine.__new__(SearchEngine)  # routing only: no model needed
    eng.index = idx
    eng.args = type("A", (), {})()
    eng.media_dir = "."
    groups = eng.find_duplicate_groups(threshold=0.95)
    assert groups and all(isinstance(g, list) for g in groups)
    from image_search_tpu.utils.metrics import global_metrics
    assert global_metrics.snapshot()["gauges"]["duplicate_scan_sketch"] == 1.0

    # force a bailout: the engine must fall back to the legacy scan
    monkeypatch.setattr(
        VectorIndex, "find_near_duplicates_sketch",
        lambda self, **kw: (_ for _ in ()).throw(DupScanBailout("forced")),
    )
    groups2 = eng.find_duplicate_groups(threshold=0.95)
    assert global_metrics.snapshot()["gauges"]["duplicate_scan_sketch"] == 0.0
    # same planted duplicates, both routes (legacy may only truncate
    # GROUP-INTERNAL pairs, never drop a whole small group)
    assert {tuple(sorted(g)) for g in groups2} == {tuple(sorted(g)) for g in groups}


# ---- approximate candidate scan (flat-corpus middle path, round-4 #3) ----


def plant_cross_block_dups(rng, emb, pairs, noise=0.01):
    """Make emb[j] a near-duplicate of emb[i] for each (i, j)."""
    emb = emb.copy()
    for i, j in pairs:
        v = emb[i] + noise * rng.normal(size=DIM).astype(np.float32)
        emb[j] = (v / np.linalg.norm(v)).astype(np.float32)
    return emb


def test_candidate_scan_flat_corpus(rng):
    """Flat corpus at a threshold where the certified scan bails out: the
    candidate scan recovers every planted pair — same-block (diagonal
    path) AND cross-block (top-c ranking path) — with exact scores and
    zero false positives."""
    n, thr = 8_192, 0.5
    cross = [(100, 4_500), (200, 7_300), (1_000, 2_222)]
    emb = plant_cross_block_dups(
        rng, plant_dups(rng, flat(rng, n), 20), cross
    )
    idx = VectorIndex(DIM)
    idx.add([f"p{i}" for i in range(n)], emb)
    idx.build_sketch()
    with pytest.raises(DupScanBailout):  # the certified scan cannot serve
        idx.find_near_duplicates_sketch(threshold=thr)
    pairs = idx.find_near_duplicates_candidates(threshold=thr)
    stored = dequantized(idx)
    got = {(i, j) for i, j, _ in pairs}
    planted = {(2 * p, 2 * p + 1) for p in range(20)} | set(cross)
    assert planted <= got, sorted(planted - got)
    # soundness is unconditional: every emitted pair >= thr - band, scores
    # match the true dot (the rescore is the certified scan's phase 2)
    oracle = oracle_pairs(stored, thr - BAND)
    got_d = {(i, j): s for i, j, s in pairs}
    assert set(got_d) <= set(oracle), sorted(set(got_d) - set(oracle))[:5]
    for k, s in got_d.items():
        assert abs(s - oracle[k]) < 2e-4, (k, s, oracle[k])


def test_candidate_scan_tombstones_and_progress(rng):
    n = 4_096
    emb = plant_dups(rng, flat(rng, n), 10)
    idx = VectorIndex(DIM)
    idx.add([f"p{i}" for i in range(n)], emb)
    idx.remove_paths(["p0"])  # kills pair (0, 1)
    idx.build_sketch()
    seen = []
    pairs = idx.find_near_duplicates_candidates(
        threshold=0.5, progress=lambda a, b: seen.append(a / b)
    )
    rows = {i for p in pairs for i in p[:2]}
    assert 0 not in rows
    assert {(2 * p, 2 * p + 1) for p in range(1, 10)} <= {
        (i, j) for i, j, _ in pairs
    }
    assert seen and seen[-1] == 1.0 and seen == sorted(seen)


def test_engine_candidate_middle_path(rng, monkeypatch):
    """Certified scan bails at scale -> the engine runs the candidate scan
    (mode='approximate'), NOT the hours-class legacy scan."""
    from image_search_tpu.server.engine import SearchEngine

    n = 2_048
    emb = plant_dups(rng, concentrated(rng, n), 8)
    idx = VectorIndex(DIM)
    idx.add([f"p{i}" for i in range(n)], emb)
    idx.build_sketch()

    eng = SearchEngine.__new__(SearchEngine)  # routing only: no model needed
    eng.index = idx
    eng.args = type("A", (), {})()
    eng.media_dir = "."
    groups_cert = eng.find_duplicate_groups(threshold=0.95)
    assert eng.last_duplicate_mode == "certified"

    monkeypatch.setattr(
        VectorIndex, "find_near_duplicates_sketch",
        lambda self, **kw: (_ for _ in ()).throw(DupScanBailout("forced")),
    )
    # below the scale cut the engine still prefers the legacy EXACT scan
    groups_legacy = eng.find_duplicate_groups(threshold=0.95)
    assert eng.last_duplicate_mode == "legacy_exact"
    monkeypatch.setattr(SearchEngine, "DUPLICATES_APPROX_ABOVE", 1_000)
    groups_approx = eng.find_duplicate_groups(threshold=0.95)
    assert eng.last_duplicate_mode == "approximate"
    assert idx.sketch_fresh  # reused the published sketch: must NOT drop it
    same = {tuple(sorted(g)) for g in groups_cert}
    assert {tuple(sorted(g)) for g in groups_approx} == same
    assert {tuple(sorted(g)) for g in groups_legacy} == same


def test_engine_drops_ungated_sketch_after_candidate_scan(rng, monkeypatch):
    """A sketch the certifiability gate refused for SEARCH, built solely
    for the approximate scan, must be unpublished afterwards."""
    from image_search_tpu.server.engine import SearchEngine

    n = 4_096
    emb = plant_dups(rng, flat(rng, n), 10)
    idx = VectorIndex(DIM)
    idx.add([f"p{i}" for i in range(n)], emb)

    eng = SearchEngine.__new__(SearchEngine)
    eng.index = idx
    # gate no sketch can pass -> the certified route never publishes one
    eng.args = type("A", (), {"twostage_min_certifiable": 1.01})()
    eng.media_dir = "."
    monkeypatch.setattr(SearchEngine, "DUPLICATES_SKETCH_ABOVE", 1_000)
    monkeypatch.setattr(SearchEngine, "DUPLICATES_APPROX_ABOVE", 1_000)
    groups = eng.find_duplicate_groups(threshold=0.5)
    assert eng.last_duplicate_mode == "approximate"
    assert not idx.sketch_fresh  # the ungated sketch was dropped
    assert {tuple(sorted((f"media/p{2*p}", f"media/p{2*p+1}")))
            for p in range(1, 10)} <= {tuple(sorted(g)) for g in groups}


def test_blockpair_values_oracle(rng):
    """Values kernel vs numpy: upper-triangle blockwise max of the
    augmented-sketch dot matrix, lower triangle -inf, honoring a nonzero
    row_block0 offset."""
    import jax.numpy as jnp

    from image_search_tpu.ops import blockmax

    r, n, da = blockmax.ROWS_TILE, blockmax.COLS_TILE_V, 65
    a = rng.normal(size=(n, da)).astype(np.float32) / np.sqrt(da)
    a16 = jnp.asarray(a, jnp.bfloat16)
    rb0 = 4  # rows r..r+RB cover block rows 4..11 of the 128 col blocks
    got = np.asarray(blockmax.blockpair_values(
        a16[rb0 * blockmax.BLOCK : rb0 * blockmax.BLOCK + r], a16,
        jnp.asarray(rb0, jnp.int32), interpret=True,
    ))
    a32 = np.asarray(a16, np.float32)
    d = a32[rb0 * blockmax.BLOCK : rb0 * blockmax.BLOCK + r] @ a32.T
    nb_r, nb_c = r // blockmax.BLOCK, n // blockmax.BLOCK
    ref = d.reshape(nb_r, blockmax.BLOCK, nb_c, blockmax.BLOCK).max((1, 3))
    rows = rb0 + np.arange(nb_r)[:, None]
    cols = np.arange(nb_c)[None, :]
    ref = np.where(cols >= rows, ref, -np.inf)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-5)
