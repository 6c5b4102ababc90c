"""Decompose the 10M int8 exact-query latency (VERDICT round-2 item 9).

The 13.97 ms top-1000 @10M int8 figure is one fused program: int8 score
matmul + mask + hierarchical exact top-k. Before attempting any "two-stage"
rework, measure where the time actually goes and whether the score sweep is
HBM-bound or MXU-padded-compute-bound:

- HBM floor: 7.74 GB int8 rows at ~819 GB/s v5e peak = **9.45 ms**.
- MXU padded-compute floor at B<=128 (the matvec pads the query dim to the
  128-wide MXU tile regardless of B): 10M*768*128 MACs = 983 G MACs =
  **10.0 ms** at bf16 peak (98.5e12 MACs/s) or **5.0 ms** if XLA's
  int8 x int8 -> int32 fast path really runs the MXU at int8 rate.

Discriminator: time the scores-only pass at B in {1, 8, 32}. Flat-in-B at
~10 ms => bf16-compute-bound (the int8 operands are upcast); ~9.5 ms =>
already at the HBM floor (nothing left on the table but selection overhead).

Corpus is generated ON-device in 1M-row chunks (no tunnel upload), exactly
like bench.py. All big buffers are EXPLICIT jit arguments — a closed-over
device array is captured as a lowering constant and serialized into the
remote compile request (7.7 GB through the tunnel; measured: stalls the
compile service for tens of minutes). One process, strictly serialized TPU
use (CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from image_search_tpu.index.index import _search_local, _write_block
    from image_search_tpu.parallel.sharded_search import quantize_rows_int8, shard_scores

    dim = 768
    n = 10_000_000
    # production slab geometry: slabs are granule-aligned (index.py:270,
    # n_shards * 4096 rows), live rows masked by `size` — so the buffer is
    # padded to a 4096 multiple exactly like a real single-shard index.
    # 2444*4096 also divides by 16384 for the stream block sweep.
    n_pad = 2444 * 4096
    ch = 1_000_000
    k = 1000

    @jax.jit
    def gen_int8(key):
        e = jax.random.normal(key, (ch, dim), jnp.float32)
        e = e / jnp.linalg.norm(e, axis=1, keepdims=True)
        return quantize_rows_int8(e)

    log("building 10M int8 corpus on device...")
    buf = jnp.zeros((n_pad, dim), jnp.int8)
    scl = jnp.zeros((n_pad,), jnp.float32)
    for i in range(n // ch):
        qi, sc = gen_int8(jax.random.key(i))
        buf = _write_block(buf, qi, jnp.asarray(i * ch, jnp.int32))
        scl = _write_block(scl, sc, jnp.asarray(i * ch, jnp.int32))
    buf.block_until_ready()
    size = jnp.asarray(n, jnp.int32)

    rng = np.random.default_rng(1)

    def mk_q(B):
        q = rng.normal(size=(B, dim)).astype(np.float32)
        return jax.device_put(q / np.linalg.norm(q, axis=1, keepdims=True))

    def timeit(fn, *args, iters=15, reps=3):
        def burst(m):
            t0 = time.perf_counter()
            out = None
            for _ in range(m):
                out = fn(*args)
            float(jnp.max(out) if out.ndim else out)  # dependent fetch
            return (time.perf_counter() - t0) / m

        burst(2)  # compile + warm
        return min(burst(iters) for _ in range(reps)) * 1e3

    results = {}

    # --- raw int8 matmul (int32 accum), no rescale ---
    @jax.jit
    def raw_i8(buf, q8):
        s32 = jax.lax.dot_general(
            q8, buf, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )
        return jnp.max(s32)

    # --- scores incl. f32 rescale (the shard_scores epilogue) ---
    @jax.jit
    def scores_f32(buf, scl, q):
        return jnp.max(shard_scores(buf, q, scl))

    # --- bf16 upcast matmul for comparison (converts int8 rows inline) ---
    @jax.jit
    def scores_bf16(buf, scl, q):
        s = jax.lax.dot_general(
            q.astype(jnp.bfloat16),
            buf.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.max(s * scl[None, :])

    for B in (1, 8, 32):
        q = mk_q(B)
        q8, q8s = quantize_rows_int8(q)
        q8.block_until_ready()
        results[f"raw_int8_matmul_B{B}_ms"] = round(timeit(raw_i8, buf, q8), 2)
        results[f"scores_rescaled_B{B}_ms"] = round(timeit(scores_f32, buf, scl, q), 2)
        log(json.dumps(results))

    q = mk_q(1)
    results["scores_bf16_upcast_B1_ms"] = round(timeit(scores_bf16, buf, scl, q), 2)

    # --- Pallas streaming score kernel (ops/score_stream.py) ---
    from image_search_tpu.ops.score_stream import stream_scores_int8

    def stream_max(buf, scl, q8, q8s, block):
        s = stream_scores_int8(buf, q8, q8s, scl, size, None, block=block)
        return jnp.max(s)

    for B in (1, 8, 32):
        q = mk_q(B)
        q8, q8s = quantize_rows_int8(q)
        q8.block_until_ready()
        results[f"stream_scores_B{B}_ms"] = round(
            timeit(stream_max, buf, scl, q8, q8s, 4096), 2
        )
        log(json.dumps(results))
    q = mk_q(1)
    q8, q8s = quantize_rows_int8(q)
    for blk in (2048, 8192, 16384):
        results[f"stream_scores_B1_blk{blk}_ms"] = round(
            timeit(stream_max, buf, scl, q8, q8s, blk), 2
        )
    log(json.dumps(results))

    # --- full fused search (the shipped path) exact vs approx, B=1 ---
    # NOTE: with ISX_SCORE_STREAM=1 (default) and the aligned slab above,
    # _search_local engages the streaming kernel — this IS the shipped path.
    def full_exact(buf, scl, q):
        s, _ = _search_local((buf,), size, q, k, (scl,), False)
        return s

    def full_approx(buf, scl, q):
        s, _ = _search_local((buf,), size, q, k, (scl,), True)
        return s

    results["full_exact_B1_ms"] = round(timeit(full_exact, buf, scl, q), 2)
    results["full_approx_B1_ms"] = round(timeit(full_approx, buf, scl, q), 2)

    # --- selection alone: exact_topk over a precomputed [1, 10M] score row ---
    from image_search_tpu.ops.topk import exact_topk

    @jax.jit
    def sel_only(s):
        v, _ = exact_topk(s, k)
        return jnp.max(v)

    s_pre = jax.random.normal(jax.random.key(7), (1, n), jnp.float32)
    s_pre.block_until_ready()
    results["exact_topk_only_B1_ms"] = round(timeit(sel_only, s_pre), 2)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
