"""Quantized index modes: int8 (per-row scales) and bfloat16 rows.

Checks recall vs the exact f32 index, Rocchio behavior, and the sharded
int8 path on the 8-device virtual mesh (BASELINE config #5 int8 store).
"""

import numpy as np
import pytest

from image_search_tpu.index import VectorIndex
from image_search_tpu.parallel import make_mesh

DIM = 96


def make_data(rng, n):
    emb = rng.normal(size=(n, DIM)).astype(np.float32) * rng.uniform(
        0.5, 2.0, size=(n, 1)
    ).astype(np.float32)
    return [f"/p/{i}.jpg" for i in range(n)], emb


def recall(a: np.ndarray, b: np.ndarray) -> float:
    a, b = set(a.reshape(-1).tolist()), set(b.reshape(-1).tolist())
    return len(a & b) / max(len(b), 1)


@pytest.mark.parametrize("quantize", ["int8", "bfloat16"])
def test_quantized_recall_vs_f32(rng, quantize):
    paths, emb = make_data(rng, 2000)
    exact = VectorIndex(DIM)
    exact.add(paths, emb)
    quant = VectorIndex(DIM, quantize=quantize)
    quant.add(paths, emb)

    q = rng.normal(size=(4, DIM)).astype(np.float32)
    se, ie = exact.search(q, 20)
    sq, iq = quant.search(q, 20)
    for b in range(4):
        assert recall(iq[b], ie[b]) >= 0.9, (quantize, b)
    # scores must approximate cosine well
    np.testing.assert_allclose(sq, se, atol=2e-2)


def test_int8_score_accuracy(rng):
    """int8 cosine scores within ~1% absolute of exact."""
    paths, emb = make_data(rng, 500)
    quant = VectorIndex(DIM, quantize="int8")
    quant.add(paths, emb)
    q = rng.normal(size=DIM).astype(np.float32)

    e = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    want = np.sort(e @ qn)[::-1][:10]
    s, _ = quant.search(q, 10)
    np.testing.assert_allclose(s[0], want, atol=1.5e-2)


def test_int8_rocchio_feedback(rng):
    paths, emb = make_data(rng, 300)
    quant = VectorIndex(DIM, quantize="int8")
    quant.add(paths, emb)
    exact = VectorIndex(DIM)
    exact.add(paths, emb)

    text = rng.normal(size=DIM).astype(np.float32)
    sel = [paths[5], paths[50]]
    sq, iq = quant.search_with_feedback(text, sel, 15)
    se, ie = exact.search_with_feedback(text, sel, 15)
    assert recall(iq, ie) >= 0.85
    np.testing.assert_allclose(sq, se, atol=3e-2)


def test_int8_raw_roundtrip_close(rng):
    paths, emb = make_data(rng, 64)
    quant = VectorIndex(DIM, quantize="int8")
    quant.add(paths, emb)
    got = quant.get_raw_embeddings(paths[:5])
    # int8 quantization: relative error ~ 1/127 per component
    np.testing.assert_allclose(got, emb[:5], rtol=0.03, atol=0.03)


def test_sharded_int8_equals_local_int8(rng):
    mesh = make_mesh()
    paths, emb = make_data(rng, 1200)
    local = VectorIndex(DIM, quantize="int8")
    local.add(paths, emb)
    sharded = VectorIndex(DIM, mesh=mesh, quantize="int8")
    sharded.add(paths, emb)

    q = rng.normal(size=(2, DIM)).astype(np.float32)
    sl, il = local.search(q, 25)
    ss, si = sharded.search(q, 25)
    np.testing.assert_allclose(ss, sl, rtol=1e-5, atol=1e-5)
    for b in range(2):
        assert set(si[b].tolist()) == set(il[b].tolist())


def test_unknown_quantize_rejected():
    with pytest.raises(ValueError):
        VectorIndex(DIM, quantize="int4")
