"""Streaming score kernel A/B at 10M: s32 vs bf16 accumulation, block sweep.

Follow-up to sweep_decomp.py (whose first run established: XLA int8 dot
12.2 ms B-flat == bf16-upcast dot 12.16 ms, i.e. bf16-rate COMPUTE-bound at
~82% — the matvec pads the query tile to 128 wide, so B <= 128 costs
983 GMACs = 10.0 ms at bf16 peak, above the 9.4 ms HBM floor). The only
way under ~12 ms is an MXU dot faster than bf16 rate: Mosaic's s8xs8->s32
measured ~1.1x bf16 (PERF_NOTES round-2) — just enough to flip the kernel
from compute-bound to HBM-bound.

Also re-measures the pieces lost to the blk=16384 VMEM OOM in the first
sweep run (16384 needs a 24.3 MB scoped-VMEM block: over the 16 MB limit;
dropped). Results stream to benchmarks/stream_kernel_bench.json after
EVERY measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "stream_kernel_bench.json")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from image_search_tpu.index.index import _search_local, _write_block
    from image_search_tpu.ops.score_stream import stream_scores_int8
    from image_search_tpu.ops.topk import exact_topk
    from image_search_tpu.parallel.sharded_search import quantize_rows_int8

    dim = 768
    n = 10_000_000
    n_pad = 2444 * 4096  # production granule alignment; also % 8192 == 0
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
            float(jnp.max(out) if out.ndim else out)  # dependent fetch
            return (time.perf_counter() - t0) / m

        burst(2)  # compile + warm
        return min(burst(iters) for _ in range(reps)) * 1e3

    def stream_max(buf, scl, q8, q8s, block, accum):
        s = stream_scores_int8(buf, q8, q8s, scl, size, None, block=block, accum=accum)
        return jnp.max(s)

    q = mk_q(1)
    q8, q8s = quantize_rows_int8(q)
    q8.block_until_ready()
    for accum in ("s32", "bf16"):
        for blk in (2048, 4096, 8192):
            record(
                f"stream_{accum}_B1_blk{blk}_ms",
                timeit(stream_max, buf, scl, q8, q8s, blk, accum),
            )

    # best-block s32 at serving batch sizes
    for B in (8, 32):
        qB = mk_q(B)
        q8B, q8sB = quantize_rows_int8(qB)
        q8B.block_until_ready()
        record(f"stream_s32_B{B}_blk4096_ms", timeit(stream_max, buf, scl, q8B, q8sB, 4096, "s32"))

    # selection alone (lost in the first sweep run)
    @jax.jit
    def sel_only(s):
        v, _ = exact_topk(s, k)
        return jnp.max(v)

    s_pre = jax.random.normal(jax.random.key(7), (1, n_pad), jnp.float32)
    s_pre.block_until_ready()
    record("exact_topk_only_B1_ms", timeit(sel_only, s_pre))
    del s_pre

    # full fused search: the shipped path (stream kernel engages: aligned
    # slab + int8 + TPU + ISX_SCORE_STREAM default on, accum default s32)
    def full_exact(buf, scl, q):
        s, _ = _search_local((buf,), size, q, k, (scl,), False)
        return s

    def full_approx(buf, scl, q):
        s, _ = _search_local((buf,), size, q, k, (scl,), True)
        return s

    record("full_exact_stream_B1_ms", timeit(full_exact, buf, scl, q))
    record("full_approx_stream_B1_ms", timeit(full_approx, buf, scl, q))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
