#!/usr/bin/env python
"""Fused stage-1 variants for the two-stage redesign (real TPU).

select_bench.py showed the 27 ms two-stage cost is (a) a pathologically
slow standalone XLA gemv for the UB pass (~12.5 ms over 2.56 GB) and (b)
``exact_topk`` at c+1=4097 (~14.5 ms). The fix under test here: express
the UB pass as a STREAM-KERNEL score pass over an AUGMENTED sketch —
columns 0..d_s-1 hold W^T r, column d_s holds the (inflated) residual
norm, zero-padded to 128 lanes — so that with q_aug = [q_s, q_res, 0...]:

    q_aug . s_aug_i  =  q_s . s_i + q_res * t_i  =  UB_i (sans constant)

and the whole bound pass rides ops/score_stream.py at its measured
~630 GB/s with the hierarchical top-(c+1) fused after it in the same jit
(exactly the shape of the 13.86 ms full scan, reading 1/3 the bytes).

Measures: stream+select for c in {1024, 2048, 4096}, the selection-free
floor, and B in {1, 8}; bf16 and f32 augmented slabs.

Run serialized with other TPU work:
    PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/select_fused_bench.py
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_006_528)  # 4096-multiple
    ap.add_argument("--k", type=int, default=1000)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="benchmarks/select_fused_bench.json")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from image_search_tpu.ops.score_stream import stream_scores_int8
    from image_search_tpu.ops.topk import exact_topk

    n, k = args.rows, args.k
    d_aug = 128
    interpret = args.cpu
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)

    key = jax.random.key(0)
    chunk = 999_424  # 4096-multiple
    rem = n - (n // chunk) * chunk

    @functools.partial(jax.jit, static_argnames=("m",))
    def gen_chunk(kk, m):
        s = jax.random.normal(kk, (m, d_aug), jnp.float32)
        s = s * (0.93 ** jnp.arange(d_aug, dtype=jnp.float32))[None, :]
        # column 127 plays the residual-norm role: small positive
        s = s.at[:, d_aug - 1].set(jnp.abs(s[:, d_aug - 1]) * 0.1 + 0.01)
        return s

    sizes = [chunk] * (n // chunk) + ([rem] if rem else [])
    parts = [gen_chunk(jax.random.fold_in(key, i), m) for i, m in enumerate(sizes)]
    aug32 = jnp.concatenate(parts, axis=0)
    aug16 = aug32.astype(jnp.bfloat16)
    q = jax.random.normal(jax.random.fold_in(key, 777), (8, d_aug), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    ones_n = jnp.ones((n,), jnp.float32)
    float(aug16[0, 0])
    print(f"aug slab built: [{n}, {d_aug}] ({n * d_aug * 2 / 1e9:.2f} GB bf16)",
          flush=True)

    @functools.partial(jax.jit, static_argnames=("kk",))
    def stream_select(rows, qa, kk: int):
        b = qa.shape[0]
        ub = stream_scores_int8(
            rows, qa, jnp.ones((b,), jnp.float32), ones_n,
            jnp.asarray(n, jnp.int32), accum="bf16", interpret=interpret,
        )
        return exact_topk(ub, kk)

    @jax.jit
    def stream_floor(rows, qa):
        b = qa.shape[0]
        ub = stream_scores_int8(
            rows, qa, jnp.ones((b,), jnp.float32), ones_n,
            jnp.asarray(n, jnp.int32), accum="bf16", interpret=interpret,
        )
        return jnp.max(ub, axis=1)

    # correctness: fused stream+select equals the plain dot + lax.top_k
    v, i = stream_select(aug16, q[:1], 64)
    want = jnp.einsum(
        "bd,nd->bn", q[:1].astype(jnp.bfloat16), aug16,
        preferred_element_type=jnp.float32,
    )
    wv, wi = jax.lax.top_k(want, 64)
    np.testing.assert_allclose(np.asarray(v), np.asarray(wv), rtol=1e-6, atol=1e-6)
    print("stream+select parity OK", flush=True)

    def time_fn(fn, reps=10):
        def burst(mm):
            t0 = time.perf_counter()
            out = None
            for _ in range(mm):
                out = fn()
            jax.tree_util.tree_map(lambda x: float(np.asarray(x).ravel()[0]), out)
            return (time.perf_counter() - t0) / mm

        burst(2)
        return min(burst(reps) for _ in range(3)) * 1e3

    res = {"rows": n, "k": k}
    for b in (1, 8):
        qa = q[:b]
        res[f"floor_bf16_b{b}_ms"] = time_fn(lambda: stream_floor(aug16, qa))
        for c in (1024, 2048, 4096):
            res[f"sel_bf16_c{c}_b{b}_ms"] = time_fn(
                lambda: stream_select(aug16, qa, c + 1)
            )
    res["floor_f32_b1_ms"] = time_fn(lambda: stream_floor(aug32, q[:1]))
    res["sel_f32_c2048_b1_ms"] = time_fn(lambda: stream_select(aug32, q[:1], 2049))
    for kk, vv in res.items():
        print(f"{kk}: {vv if isinstance(vv, int) else round(vv, 3)}", flush=True)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
