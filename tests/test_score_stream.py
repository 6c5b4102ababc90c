"""Streaming int8 score kernel parity (interpret mode on CPU).

The kernel must be BITWISE equal to the XLA int8 scoring path it replaces
(``parallel/sharded_search.py:42`` + the mask/penalty epilogue in
``index/index.py::_search_local``): int8 products accumulated in f32 are
exact integers < 2^24, so there is no tolerance to hide behind.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_search_tpu.index.index import NEG_INF
from image_search_tpu.ops.score_stream import stream_ok, stream_scores_int8
from image_search_tpu.parallel.sharded_search import quantize_rows_int8, shard_scores


def _xla_oracle(rows, q, scales, limit, pens):
    s = shard_scores(rows, q, scales)
    if pens is not None:
        s = s + pens[None, :]
    n = rows.shape[0]
    valid = jax.lax.broadcasted_iota(jnp.int32, (n,), 0) < limit
    return jnp.where(valid[None, :], s, NEG_INF)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _mk(rng, n, d, b):
    raw = rng.standard_normal((n, d)).astype(np.float32)
    raw /= np.linalg.norm(raw, axis=1, keepdims=True)
    rows, scales = quantize_rows_int8(jnp.asarray(raw))
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return rows, scales, jnp.asarray(q)


@pytest.mark.parametrize("accum", ["s32", "bf16"])
@pytest.mark.parametrize("b", [1, 8])
@pytest.mark.parametrize("limit_frac", [1.0, 0.6, 0.0])
def test_stream_scores_bitwise_vs_xla(rng, b, limit_frac, accum):
    n, d, block = 1024, 256, 256
    rows, scales, q = _mk(rng, n, d, b)
    qi, qs = quantize_rows_int8(q)
    limit = int(n * limit_frac)
    got = stream_scores_int8(
        rows, qi, qs, scales, jnp.int32(limit), None, block=block,
        interpret=True, accum=accum,
    )
    want = _xla_oracle(rows, q, scales, limit, None)
    assert got.shape == (b, n)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_stream_scores_with_penalties_bitwise(rng):
    n, d, block, b = 512, 128, 128, 4
    rows, scales, q = _mk(rng, n, d, b)
    qi, qs = quantize_rows_int8(q)
    pens = jnp.zeros((n,), jnp.float32).at[jnp.array([3, 77, 400])].set(NEG_INF)
    got = stream_scores_int8(
        rows, qi, qs, scales, jnp.int32(n), pens, block=block, interpret=True
    )
    want = _xla_oracle(rows, q, scales, n, pens)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # tombstoned rows can never win: their scores sit at/below NEG_INF
    assert np.all(np.asarray(got)[:, [3, 77, 400]] <= NEG_INF)


def test_stream_scores_multiblock_grid(rng):
    n, d, block, b = 2048, 128, 256, 2
    rows, scales, q = _mk(rng, n, d, b)
    qi, qs = quantize_rows_int8(q)
    limit = 1000  # cuts mid-block: mask must use GLOBAL position
    got = stream_scores_int8(
        rows, qi, qs, scales, jnp.int32(limit), None, block=block, interpret=True
    )
    want = _xla_oracle(rows, q, scales, limit, None)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_stream_ok_gating():
    ok = jnp.zeros((4096, 768), jnp.int8)
    assert stream_ok(ok)
    assert not stream_ok(jnp.zeros((4096, 768), jnp.float32))  # wrong dtype
    assert not stream_ok(jnp.zeros((4100, 768), jnp.int8))  # ragged rows
    assert not stream_ok(jnp.zeros((4096, 100), jnp.int8))  # ragged lanes
