#!/usr/bin/env python
"""Decompose two-stage stage-1 cost at 10M rows (real TPU).

benchmarks/twostage_10m.py measured 27.0 ms for the two-stage path vs the
13.8 ms full scan it is supposed to beat — ~20 ms over the design estimate
(docs/PERF_NOTES.md "two-stage beats the read floor legally"). Suspects:

  a. the UB pass itself: a [B,64] x [10M,64]^T gemv at HIGHEST precision
     may run far below the 640 GB/s streamed-read wall XLA reaches on big
     matmuls;
  b. ``exact_topk(ub, c+1)`` at c=4096: the hierarchy was tuned for
     k=1000 — at k=4097 HOLD doubles to 16384 and the final ``lax.top_k``
     runs over HOLD*128 = 2M values, which on TPU is near a full sort;
  c. the candidate-row gather + rescore.

This bench times each in isolation, plus a THRESHOLD-based selection
prototype that avoids big-k top_k entirely: pick a per-query threshold
theta from a device sample quantile (verified with exact count passes,
bisecting on the rare miss), then compact {i : UB_i > theta} via
cumsum+searchsorted, with rest_max the EXACT max over the complement.
The certificate stays sound for ANY candidate set as long as rest_max
truly bounds every non-candidate — threshold selection gives that by
construction (see index/twostage.py module doc).

Run on the real chip (serialize with other TPU work):
    python benchmarks/select_bench.py [--rows 10000000] [--batch 1]
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--k", type=int, default=1000)
    ap.add_argument("--c", type=int, default=4096)
    ap.add_argument("--ds", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="benchmarks/select_bench.json")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from image_search_tpu.ops.topk import exact_topk

    n, b, k, c, ds = args.rows, args.batch, args.k, args.c, args.ds
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)

    # corpus sketch: concentrated-ish spectrum so UB values have realistic
    # spread (threshold counts depend on the tail shape, not exact values)
    key = jax.random.key(0)
    kq, ks, kt = jax.random.split(key, 3)
    chunk = 1_000_000

    @jax.jit
    def gen_chunk(kk):
        s = jax.random.normal(kk, (chunk, ds), jnp.float32)
        s = s * (0.9 ** jnp.arange(ds, dtype=jnp.float32))[None, :]
        return s

    parts = [gen_chunk(jax.random.fold_in(ks, i)) for i in range(n // chunk)]
    sk = jnp.concatenate(parts, axis=0)
    resid = jax.random.uniform(kt, (n,), jnp.float32, 0.01, 0.12)
    q_s = jax.random.normal(kq, (b, ds), jnp.float32)
    q_s = q_s / jnp.linalg.norm(q_s, axis=1, keepdims=True)
    q_res = jnp.full((b,), 0.25, jnp.float32)
    float(sk[0, 0])
    print(f"sketch built: [{n}, {ds}] f32 ({n * ds * 4 / 1e9:.2f} GB)", flush=True)

    HI = jax.lax.Precision.HIGHEST

    @jax.jit
    def ub_pass(q_s, sk, resid, q_res):
        dot = jax.lax.dot_general(
            q_s, sk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HI,
        )
        return dot + q_res[:, None] * resid[None, :]

    @jax.jit
    def ub_pass_default(q_s, sk, resid, q_res):
        dot = jax.lax.dot_general(
            q_s, sk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dot + q_res[:, None] * resid[None, :]

    sk16 = sk.astype(jnp.bfloat16)

    @jax.jit
    def ub_pass_bf16(q_s, sk16, resid, q_res):
        dot = jax.lax.dot_general(
            q_s.astype(jnp.bfloat16), sk16, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dot + q_res[:, None] * resid[None, :]

    ub = ub_pass(q_s, sk, resid, q_res)
    float(ub[0, 0])

    @functools.partial(jax.jit, static_argnames=("kk",))
    def sel_exact(ub, kk):
        return exact_topk(ub, kk)

    @functools.partial(jax.jit, static_argnames=("kk",))
    def sel_plain(ub, kk):
        return jax.lax.top_k(ub, kk)

    # --- threshold selection prototype -----------------------------------
    m = 262_144  # device sample size for the quantile guess
    samp_idx = jnp.asarray(np.linspace(0, n - 1, m).astype(np.int32))

    @functools.partial(jax.jit, static_argnames=("k", "c"))
    def sel_threshold(ub, samp_idx, k: int, c: int):
        B, N = ub.shape
        target = int(0.6 * c)
        r = max(k, int(round(m * target / N)))
        samp = ub[:, samp_idx]
        th0 = jax.lax.top_k(samp, r)[0][:, -1]  # [B] quantile guess

        def count(th):
            return jnp.sum((ub > th[:, None]).astype(jnp.int32), axis=1)

        def cond(st):
            it, th, lo, hi, cnt, ok = st
            return jnp.logical_and(it < 25, ~jnp.all(ok))

        def body(st):
            it, th, lo, hi, cnt, ok = st
            # bisect only the queries whose count missed [k, c]
            too_many = cnt > c
            too_few = cnt < k
            lo = jnp.where(too_many & ~ok, th, lo)
            hi = jnp.where(too_few & ~ok, th, hi)
            th = jnp.where(ok, th, (lo + hi) * 0.5)
            cnt = count(th)
            ok = ok | ((cnt >= k) & (cnt <= c))
            return it + 1, th, lo, hi, cnt, ok

        cnt0 = count(th0)
        ok0 = (cnt0 >= k) & (cnt0 <= c)
        lo = jnp.full((B,), -4.0, jnp.float32)
        hi = jnp.full((B,), 4.0, jnp.float32)
        _, th, _, _, cnt, ok = jax.lax.while_loop(
            cond, body, (jnp.int32(0), th0, lo, hi, cnt0, ok0)
        )
        mask = ub > th[:, None]
        csum = jnp.cumsum(mask.astype(jnp.int32), axis=1)
        targets = jnp.arange(1, c + 1, dtype=jnp.int32)
        cand = jax.vmap(lambda cs: jnp.searchsorted(cs, targets, side="left"))(csum)
        cand = jnp.minimum(cand, N - 1).astype(jnp.int32)
        valid = targets[None, :] <= cnt[:, None]
        rest_max = jnp.max(jnp.where(mask, -jnp.inf, ub), axis=1)
        return cand, valid, rest_max, ok, cnt

    # --- correctness spot-check vs exact selection -----------------------
    cand, valid, rest_max, ok, cnt = sel_threshold(ub, samp_idx, k, c)
    ev, ei = sel_exact(ub, c + 1)
    ub_np = np.asarray(ub[0])
    cand0 = np.asarray(cand[0])[np.asarray(valid[0])]
    assert bool(ok[0]), "threshold search failed to land in [k, c]"
    got_rest = float(rest_max[0])
    mask_np = np.zeros(n, bool)
    mask_np[cand0] = True
    want_rest = ub_np[~mask_np].max()
    assert abs(got_rest - want_rest) < 1e-6, (got_rest, want_rest)
    # every candidate the exact top-(count) selection finds is in our set
    top_cnt = np.argsort(-ub_np)[: int(cnt[0])]
    assert set(top_cnt) <= set(cand0.tolist()), "threshold set misses top rows"
    print(f"threshold selection OK: count={int(cnt[0])} rest_max matches", flush=True)

    def time_fn(fn, reps=10):
        def burst(mm):
            t0 = time.perf_counter()
            out = None
            for _ in range(mm):
                out = fn()
            jax.tree_util.tree_map(
                lambda x: float(np.asarray(x).ravel()[0]), out
            )
            return (time.perf_counter() - t0) / mm

        burst(2)
        return min(burst(reps) for _ in range(3)) * 1e3

    res = {"rows": n, "batch": b, "k": k, "c": c}
    res["ub_pass_highest_ms"] = time_fn(lambda: ub_pass(q_s, sk, resid, q_res))
    res["ub_pass_default_ms"] = time_fn(lambda: ub_pass_default(q_s, sk, resid, q_res))
    res["ub_pass_bf16_ms"] = time_fn(lambda: ub_pass_bf16(q_s, sk16, resid, q_res))
    res["sel_exact_topk_c1_ms"] = time_fn(lambda: sel_exact(ub, c + 1))
    res["sel_exact_topk_k_ms"] = time_fn(lambda: sel_exact(ub, k))
    res["sel_plain_topk_c1_ms"] = time_fn(lambda: sel_plain(ub, c + 1))
    res["sel_threshold_ms"] = time_fn(lambda: sel_threshold(ub, samp_idx, k, c))
    for kk, v in res.items():
        print(f"{kk}: {v if isinstance(v, int) else round(v, 3)}", flush=True)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
