"""Decide ISX_SCORE_STREAM's default: full exact search, stream vs XLA, B in {1,8,32}.

stream_kernel_bench.py showed scores-only is engine-neutral at B=1
(~12.4 ms both; MXU-bf16-compute-bound, not HBM-bound) but the raw stream
kernel degrades with B (16.38 ms at B=32). The serving path runs batched
buckets {8,16,32}, so the default must be decided on FULL fused search at
those batch sizes. Both engines composed explicitly here (no env toggling —
the jit cache would mask it). Results stream to stream_vs_xla_batched.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "stream_vs_xla_batched.json"
)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from image_search_tpu.index.index import NEG_INF, _write_block
    from image_search_tpu.ops.score_stream import stream_scores_int8
    from image_search_tpu.ops.topk import exact_topk
    from image_search_tpu.parallel.sharded_search import quantize_rows_int8, shard_scores

    dim = 768
    n = 10_000_000
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

    @partial(jax.jit, static_argnames=("k",))
    def full_xla(buf, scl, q, k):
        s = shard_scores(buf, q, scl)
        valid = jax.lax.broadcasted_iota(jnp.int32, (n_pad,), 0) < size
        s = jnp.where(valid[None, :], s, NEG_INF)
        v, _ = exact_topk(s, k)
        return jnp.max(v)

    @partial(jax.jit, static_argnames=("k",))
    def full_stream(buf, scl, q, k):
        qi, qs = quantize_rows_int8(q)
        s = stream_scores_int8(buf, qi, qs, scl, size, None)
        v, _ = exact_topk(s, k)
        return jnp.max(v)

    rng = np.random.default_rng(1)
    results = {}

    def record(key, ms):
        results[key] = round(ms, 2)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
        log(f"{key}: {results[key]} ms")

    def timeit(fn, *args, iters=15, reps=3):
        def burst(m):
            t0 = time.perf_counter()
            out = None
            for _ in range(m):
                out = fn(*args)
            float(out)
            return (time.perf_counter() - t0) / m

        burst(2)
        return min(burst(iters) for _ in range(reps)) * 1e3

    for B in (1, 8, 32):
        q = rng.normal(size=(B, dim)).astype(np.float32)
        q = jax.device_put(q / np.linalg.norm(q, axis=1, keepdims=True))
        q.block_until_ready()
        record(f"full_xla_B{B}_ms", timeit(full_xla, buf, scl, q, k))
        record(f"full_stream_B{B}_ms", timeit(full_stream, buf, scl, q, k))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
