"""Two-stage query decomposition at 10M rows: where do the milliseconds go?

The round-3 queue measured the v1 (row-candidate) two-stage path at
27.0 ms @10M — WORSE than the 13.86 ms full scan it exists to beat,
despite a ~4 ms bound-pass read. This harness splits the pipeline into
its parts on the real chip to pin the sink (hypothesis: exact_topk at
k=4097 escalates HOLD to 16384 and ends in a 2.1M-value lax.top_k sort),
and measures the v2 block-candidate path (index/twostage.py
twostage_topk_block) that replaces that sort with a top_k over N/128
blockmaxes + contiguous block gathers.

Parts timed (10M int8 rows, concentrated spectrum, d_s=64 sketch):
  full_b{1,8}         : full-scan exact anchor (_search_local)
  v1_b1               : row-candidate two-stage, c=4096 (the 27 ms)
  ub_only             : stage-1 UB -> blockmax reduce only (read-bound part)
  sel_topk_k{1001,4097}: exact_topk over a PRECOMPUTED [1, N] UB array
  sel_block_m4096     : lax.top_k over the [1, N/128] blockmaxes
  v2_b{1,8}_m{...}    : block path end-to-end + cert + margin + match-full
  v2 bf16 sketch      : halved bound-pass bytes

Incremental JSON (tunnel discipline); ONE process, serialized.
CPU smoke: ISX_CPU_SMOKE=1 python benchmarks/twostage_decomp.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "twostage_decomp.smoke.json"
    if os.environ.get("ISX_CPU_SMOKE")
    else "twostage_decomp.json",
)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--rank", type=int, default=64)
    ap.add_argument("--noise", type=float, default=0.02)
    ap.add_argument("--k", type=int, default=1000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from image_search_tpu.index import twostage
    from image_search_tpu.index.index import _search_local, _write_block
    from image_search_tpu.ops.topk import exact_topk
    from image_search_tpu.parallel.sharded_search import quantize_rows_int8

    if os.environ.get("ISX_CPU_SMOKE"):
        jax.config.update("jax_platforms", "cpu")
        args.rows = min(args.rows, 64_000)
    else:
        assert jax.default_backend() == "tpu"
        probe = jnp.ones((8, 8), jnp.bfloat16)
        float((probe @ probe)[0, 0])

    n, d, k = args.rows, args.dim, args.k
    n_pad = -(-n // 4096) * 4096
    nb = n_pad // twostage.BLOCK
    ch = min(1_000_000, n)
    assert n % ch == 0
    results = {"rows": n, "k": k}

    def save():
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    mix = jax.device_put(
        jnp.asarray(np.random.default_rng(7).normal(size=(args.rank, d)), jnp.float32)
    )

    @jax.jit
    def gen(key):
        kz, kn = jax.random.split(key)
        e = (
            jax.random.normal(kz, (ch, args.rank), jnp.float32) @ mix
            + args.noise * jax.random.normal(kn, (ch, d), jnp.float32)
        )
        e = e / jnp.linalg.norm(e, axis=1, keepdims=True)
        return quantize_rows_int8(e)

    buf = jnp.zeros((n_pad, d), jnp.int8)
    scl = jnp.zeros((n_pad,), jnp.float32)
    for i in range(n // ch):
        qv, sc = gen(jax.random.key(i))
        buf = _write_block(buf, qv, jnp.asarray(i * ch, jnp.int32))
        scl = _write_block(scl, sc, jnp.asarray(i * ch, jnp.int32))
    float(buf[0, 0])
    log("corpus built")

    def queries(b):
        rng = np.random.default_rng(99)
        q = rng.normal(size=(b, args.rank)).astype(np.float32) @ np.asarray(mix)
        q = q + args.noise * rng.normal(size=(b, d)).astype(np.float32)
        return jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True))

    def time_fn(fn, m=10):
        def burst(mm):
            t0 = time.perf_counter()
            out = None
            for _ in range(mm):
                out = fn()
            jax.tree_util.tree_map(
                lambda x: float(np.asarray(x).ravel()[0]), out[0]
            )
            return (time.perf_counter() - t0) / mm

        burst(2)
        return min(burst(m) for _ in range(3)) * 1e3

    size = jnp.asarray(n, jnp.int32)

    # sketch (f32 + bf16)
    idx_s = jnp.asarray(np.linspace(0, n - 1, 8192).astype(np.int32))
    from image_search_tpu.index.index import _gather_rows

    sample = np.asarray(_gather_rows((buf,), (scl,), idx_s), np.float32)
    basis = jnp.asarray(twostage.fit_basis(sample, 64))
    sk, rs, slack = twostage.sketch_slab(buf, scl, basis, False)
    sk16, rs16, slack16 = twostage.sketch_slab(buf, scl, basis, True)
    float(rs[0])
    log("sketch built")

    # anchors
    for b in (1, 8):
        q = queries(b)
        results[f"full_b{b}_ms"] = round(
            time_fn(lambda: _search_local((buf,), size, q, k, (scl,), False, None)),
            2,
        )
        save()
    q1 = queries(1)
    results["v1_b1_ms"] = round(
        time_fn(
            lambda: twostage.twostage_topk(
                (buf,), (sk,), (rs,), basis, size, q1, k, 4096, (scl,), None, slack
            )
        ),
        2,
    )
    save()
    log(json.dumps(results))

    # stage-1-only: UB -> blockmax reduce, no selection (read-bound part)
    @jax.jit
    def ub_blockmax(qq, sk_a, rs_a):
        from image_search_tpu.index.index import _l2

        qn = _l2(qq)
        qt, _, _ = twostage._exact_query_vector(qn, True)
        q_s = jnp.matmul(qt, basis, precision=twostage.HIGHEST)
        qs2 = jnp.sum(q_s * q_s, 1)
        q_res = jnp.sqrt(
            jnp.maximum(jnp.sum(qt * qt, 1) - qs2, 0.0) + twostage.SLACK_T
        )
        dot = jax.lax.dot_general(
            q_s.astype(sk_a.dtype), sk_a, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=twostage.HIGHEST,
        )
        ub = dot + q_res[:, None] * rs_a[None, :]
        return ub.reshape(qq.shape[0], nb, twostage.BLOCK).max(2)

    results["ub_only_ms"] = round(
        time_fn(lambda: (jnp.max(ub_blockmax(q1, sk, rs)),)), 2
    )
    results["ub_only_bf16_ms"] = round(
        time_fn(lambda: (jnp.max(ub_blockmax(q1, sk16, rs16)),)), 2
    )
    save()
    log(json.dumps(results))

    # selection standalone over a precomputed UB-like array
    ub_flat = jax.device_put(
        jnp.asarray(
            np.random.default_rng(3).normal(size=(1, n_pad)).astype(np.float32)
        )
    )
    for kk in (1001, 4097):
        results[f"sel_exact_topk_k{kk}_ms"] = round(
            time_fn(lambda kk=kk: exact_topk(ub_flat, kk)), 2
        )
        save()
    bmax_pre = ub_flat.reshape(1, nb, twostage.BLOCK).max(2)
    bmax_pre = jax.device_put(bmax_pre)
    for kk in (2049, 4097, 8193):
        if kk < nb:
            results[f"sel_block_topk_k{kk}_ms"] = round(
                time_fn(lambda kk=kk: jax.lax.top_k(bmax_pre, kk)), 2
            )
            save()
    log(json.dumps(results))

    # v2 block path end-to-end
    def audit(tag, vals, ids, cert, b):
        certified = bool(jnp.all(cert))
        results[f"{tag}_certified"] = certified
        if certified:
            fs, fi = _search_local((buf,), size, queries(b), k, (scl,), False, None)
            ids_np, fi_np = np.asarray(ids), np.asarray(fi)
            results[f"{tag}_matches_full"] = bool(jnp.all(fs == vals)) and all(
                set(ids_np[r]) == set(fi_np[r]) for r in range(b)
            )

    def clamp_ms(ms):
        """Scale candidate-block counts down for smoke-size corpora."""
        out = sorted({m if m < nb else max(8, nb // 4) for m in ms})
        return [m for m in out if m < nb]

    for b in (1, 2, 4, 8):
        qb = queries(b)
        for m in clamp_ms((2048, 4096, 8192) if b == 1 else (4096, 8192)):
            tag = f"v2_b{b}_m{m}"
            fn = lambda m=m, qb=qb: twostage.twostage_topk_block(
                (buf,), (sk,), (rs,), basis, size, qb, k, m, (scl,), None, slack
            )
            results[f"{tag}_ms"] = round(time_fn(fn), 2)
            vals, ids, cert = fn()
            audit(tag, vals, ids, cert, b)
            save()
            log(json.dumps({kk: results[kk] for kk in results if tag in kk}))

    # v2 with bf16 sketch (halved bound-pass bytes)
    for b in (1, 4, 8):
        qb = queries(b)
        m = 4096 if 4096 < nb else max(8, nb // 4)
        tag = f"v2_bf16_b{b}_m{m}"
        fn = lambda qb=qb: twostage.twostage_topk_block(
            (buf,), (sk16,), (rs16,), basis, size, qb, k, m, (scl,), None, slack16
        )
        results[f"{tag}_ms"] = round(time_fn(fn), 2)
        vals, ids, cert = fn()
        audit(tag, vals, ids, cert, b)
        save()
        log(json.dumps({kk: results[kk] for kk in results if tag in kk}))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
