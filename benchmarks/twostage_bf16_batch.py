"""bf16-sketch BATCHED two-stage certification frontier (real TPU, 10M).

PERF_NOTES "union selection" battery left one cell unmeasured: the bf16
sketch halves the bound-pass bytes (8.38 vs 10.13 ms at B=1) but FAILED
certification at B=4/8 with m=4096 — its ub_slack eats the thinner
per-query union share. Hypothesis: doubling the per-query block floor
(c/2 = 2048 blocks/query instead of f32's measured c/4 frontier) restores
certification while the halved stage-1 read keeps the batch cheaper than
f32 at the same share. This measures, at 10M int8 rows, k=1000, on the
concentrated spectrum (the realistic case — flat never certifies):

  bf16 B=2 m=4096 / B=4 m=8192 / B=8 m=16384   (2048 blocks per query)
  f32 controls at the same (B, m)              (same share, fatter read)
  full-scan anchors at each B

Certified rows are audited bitwise-equal to the full scan. Incremental
JSON; ONE process, serialized (CLAUDE.md). Outcome feeds the dtype-aware
per-query floor in index.py::search_twostage_feedback_batch.

Run: python benchmarks/twostage_bf16_batch.py
CPU smoke: ISX_CPU_SMOKE=1 python benchmarks/twostage_bf16_batch.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SMOKE = bool(os.environ.get("ISX_CPU_SMOKE"))
OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "twostage_bf16_batch.smoke.json" if SMOKE else "twostage_bf16_batch.json",
)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from image_search_tpu.index import twostage
    from image_search_tpu.index.index import (
        _gather_rows, _search_local, _write_block)
    from image_search_tpu.parallel.sharded_search import quantize_rows_int8

    rows, d, rank, noise, k = 10_000_000, 768, 64, 0.02, 1000
    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
        rows, k = 64_000, 100
    else:
        assert jax.default_backend() == "tpu"
        probe = jnp.ones((8, 8), jnp.bfloat16)
        float((probe @ probe)[0, 0])

    n_pad = -(-rows // 4096) * 4096
    nb = n_pad // twostage.BLOCK
    ch = min(1_000_000, rows)
    assert rows % ch == 0
    results = {"rows": rows, "k": k}

    def save():
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    mix = jax.device_put(
        jnp.asarray(np.random.default_rng(7).normal(size=(rank, d)), jnp.float32)
    )

    @jax.jit
    def gen(key):
        kz, kn = jax.random.split(key)
        e = (
            jax.random.normal(kz, (ch, rank), jnp.float32) @ mix
            + noise * jax.random.normal(kn, (ch, d), jnp.float32)
        )
        e = e / jnp.linalg.norm(e, axis=1, keepdims=True)
        return quantize_rows_int8(e)

    buf = jnp.zeros((n_pad, d), jnp.int8)
    scl = jnp.zeros((n_pad,), jnp.float32)
    for i in range(rows // ch):
        qv, sc = gen(jax.random.key(i))
        buf = _write_block(buf, qv, jnp.asarray(i * ch, jnp.int32))
        scl = _write_block(scl, sc, jnp.asarray(i * ch, jnp.int32))
    float(buf[0, 0])
    log("corpus built")

    def queries(b):
        rng = np.random.default_rng(99)  # same distinct queries as decomp
        q = rng.normal(size=(b, rank)).astype(np.float32) @ np.asarray(mix)
        q = q + noise * rng.normal(size=(b, d)).astype(np.float32)
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

    size = jnp.asarray(rows, jnp.int32)

    idx_s = jnp.asarray(np.linspace(0, rows - 1, 8192).astype(np.int32))
    sample = np.asarray(_gather_rows((buf,), (scl,), idx_s), np.float32)
    basis = jnp.asarray(twostage.fit_basis(sample, 64))
    sk32, rs32, slack32 = twostage.sketch_slab(buf, scl, basis, False)
    sk16, rs16, slack16 = twostage.sketch_slab(buf, scl, basis, True)
    float(rs32[0])
    log("sketches built")
    results["bf16_ub_slack"] = float(slack16)
    save()

    def audit(tag, vals, ids, cert, b):
        certified = bool(jnp.all(cert))
        results[f"{tag}_certified"] = certified
        if certified:
            fs, fi = _search_local((buf,), size, queries(b), k, (scl,), False, None)
            ids_np, fi_np = np.asarray(ids), np.asarray(fi)
            results[f"{tag}_matches_full"] = bool(jnp.all(fs == vals)) and all(
                set(ids_np[r]) == set(fi_np[r]) for r in range(b)
            )

    per_q = max(k // twostage.BLOCK + 1, 2048 if not SMOKE else 32)
    for b in (2, 4, 8):
        m = min(per_q * b, nb - 1)
        if m * twostage.BLOCK < k or (m // b) * twostage.BLOCK < k:
            continue
        qb = queries(b)
        results[f"full_b{b}_ms"] = round(
            time_fn(lambda qb=qb: _search_local(
                (buf,), size, qb, k, (scl,), False, None)), 2
        )
        save()
        for name, (sk, rs, slack) in (
            ("bf16", (sk16, rs16, slack16)), ("f32", (sk32, rs32, slack32)),
        ):
            tag = f"{name}_b{b}_m{m}"
            fn = lambda sk=sk, rs=rs, slack=slack, m=m, qb=qb: (
                twostage.twostage_topk_block(
                    (buf,), (sk,), (rs,), basis, size, qb, k, m,
                    (scl,), None, slack,
                )
            )
            results[f"{tag}_ms"] = round(time_fn(fn), 2)
            vals, ids, cert = fn()
            audit(tag, vals, ids, cert, b)
            save()
            log(json.dumps({kk: results[kk] for kk in results if tag in kk}))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
