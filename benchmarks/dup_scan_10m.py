"""Sketch-pruned complete duplicate scan at 10M rows (round-3 verdict #2).

The legacy per-row self-scan measured 97-165 s at 1M (dup_scan_1m.json)
and extrapolates to ~3-4.5 HOURS at 10M. This measures the sketch route
(index/dupscan.py + ops/blockmax.py) end to end on the real chip:

  corpus   10M device-generated int8 rows, rank-64-dominant spectrum
           (noise 0.02) — the spectral shape of real image embeddings,
           same generator as twostage_10m.py — in 2^20-row slabs.
  planted  200 exact-duplicate pairs (int8 row + scale copied), spread
           with a stride so pairs land in different blocks/slabs.
  audit    every planted pair must be in the output (200/200 recall);
           the scan is certified-complete so a miss is a correctness bug,
           not a tuning artifact.

Reported: phase split (sketch build / phase-1 sweep via progress
callback / total), survivor counts, recall. Target: <= 15 min total.

ISX_CPU_SMOKE=1 runs the whole harness at 64k rows on CPU (correctness
only, separate .smoke.json output) — run this BEFORE spending a TPU
session. ONE process, serialized (tunnel discipline, CLAUDE.md).
Run: python benchmarks/dup_scan_10m.py [--rows 10000000]
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
    "dup_scan_10m.smoke.json" if os.environ.get("ISX_CPU_SMOKE") else "dup_scan_10m.json",
)

SLAB = 1 << 20  # rows per slab (int8 x 768 = 0.77 GB; chunked per CLAUDE.md)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--rank", type=int, default=64)
    ap.add_argument("--noise", type=float, default=0.02)
    ap.add_argument("--threshold", type=float, default=0.95)
    ap.add_argument("--pairs", type=int, default=200)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from image_search_tpu.index import dupscan, twostage
    from image_search_tpu.index.index import _gather_rows
    from image_search_tpu.parallel.sharded_search import quantize_rows_int8

    if os.environ.get("ISX_CPU_SMOKE"):
        jax.config.update("jax_platforms", "cpu")
        args.rows = min(args.rows, 64_000)
    else:
        assert jax.default_backend() == "tpu"
        probe = jnp.ones((8, 8), jnp.bfloat16)
        float((probe @ probe)[0, 0])
        log("[probe] ok")

    n, d = args.rows, args.dim
    # slab size tracks the corpus (padding rows cost phase-1 sweep time —
    # fatal in CPU-interpret smoke mode, wasteful on TPU)
    slab_rows = min(SLAB, -(-n // 4096) * 4096)
    n_slabs = -(-n // slab_rows)
    results = {"rows": n, "threshold": args.threshold, "planted": args.pairs}

    def save():
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    # ---- corpus: per-slab device generation (same spectrum as twostage_10m)
    mix = jax.device_put(
        jnp.asarray(np.random.default_rng(7).normal(size=(args.rank, d)), jnp.float32)
    )
    gen_ch = min(slab_rows, 1 << 18)  # generation chunk inside a slab
    assert slab_rows % gen_ch == 0

    @jax.jit
    def gen(key):
        kz, kn = jax.random.split(key)
        e = (
            jax.random.normal(kz, (gen_ch, args.rank), jnp.float32) @ mix
            + args.noise * jax.random.normal(kn, (gen_ch, d), jnp.float32)
        )
        e = e / jnp.linalg.norm(e, axis=1, keepdims=True)
        return quantize_rows_int8(e)

    t0 = time.perf_counter()
    slabs, scales = [], []
    for si in range(n_slabs):
        parts_v, parts_s = [], []
        for ci in range(slab_rows // gen_ch):
            qv, sc = gen(jax.random.key(si * 1024 + ci))
            parts_v.append(qv)
            parts_s.append(sc)
        slabs.append(jnp.concatenate(parts_v, axis=0))
        scales.append(jnp.concatenate(parts_s, axis=0))
    float(slabs[-1][0, 0])  # dependent fetch: generation complete
    results["build_corpus_s"] = round(time.perf_counter() - t0, 1)
    save()
    log(f"[corpus] {n_slabs} slabs x {slab_rows} rows in {results['build_corpus_s']}s")

    # ---- plant exact duplicate pairs: copy int8 row + scale src -> dst.
    # Stride spreads pairs over slabs; +701 keeps src/dst in different
    # 128-row blocks (and occasionally different slabs is fine: the
    # scatter below is per-slab on the DST side, sources already gathered).
    stride = max((n - 800) // args.pairs, 1)
    src = np.arange(args.pairs, dtype=np.int64) * stride
    dst = src + 701
    assert dst.max() < n
    src_rows = np.asarray(_gather_rows(tuple(slabs), tuple(scales),
                                       jnp.asarray(src, jnp.int32)))
    # re-quantize the dequantized source rows and scatter into dst slabs
    qv_dst, sc_dst = quantize_rows_int8(jnp.asarray(src_rows, jnp.float32))
    for si in range(n_slabs):
        m = (dst >= si * slab_rows) & (dst < (si + 1) * slab_rows)
        if not m.any():
            continue
        loc = jnp.asarray(dst[m] - si * slab_rows, jnp.int32)
        slabs[si] = slabs[si].at[loc].set(qv_dst[np.nonzero(m)[0]])
        scales[si] = scales[si].at[loc].set(sc_dst[np.nonzero(m)[0]])
    float(slabs[-1][0, 0])
    log(f"[plant] {args.pairs} pairs, stride {stride}")

    # ---- sketch build (bf16 storage: halves phase-1 HBM traffic)
    t0 = time.perf_counter()
    samp_idx = jnp.asarray(np.linspace(0, n - 1, 8192).astype(np.int32))
    sample = np.asarray(_gather_rows(tuple(slabs), tuple(scales), samp_idx), np.float32)
    basis = jnp.asarray(twostage.fit_basis(sample, 64))
    sk_parts, rs_parts, slacks = [], [], []
    for si in range(n_slabs):
        s, t, sl = twostage.sketch_slab(slabs[si], scales[si], basis, to_bf16=True)
        sk_parts.append(s)
        rs_parts.append(t)
        slacks.append(sl)
    ub_slack = jnp.max(jnp.stack(slacks))
    float(ub_slack)
    sketch = twostage.SketchState(
        basis=basis,
        sketches=tuple(sk_parts),
        resid=tuple(rs_parts),
        built_rows=n,
        ub_slack=ub_slack,
    )
    results["sketch_build_s"] = round(time.perf_counter() - t0, 1)
    save()
    log(f"[sketch] built in {results['sketch_build_s']}s "
        f"(ub_slack={float(ub_slack):.5f})")

    # ---- the scan: phase timings from the progress callback (phase 1 ends
    # at frac 0.5 by construction, dupscan.sketch_duplicate_pairs)
    marks = {}

    def progress(a, b):
        f = a / b
        if f >= 0.5 and "p1_end" not in marks:
            marks["p1_end"] = time.perf_counter()

    t0 = time.perf_counter()
    pairs = dupscan.sketch_duplicate_pairs(
        tuple(slabs), tuple(scales), None, n, sketch, args.threshold,
        progress=progress,
    )
    total_s = time.perf_counter() - t0
    results["scan_total_s"] = round(total_s, 1)
    results["scan_phase1_s"] = round(marks.get("p1_end", t0) - t0, 1)
    results["scan_phase2_s"] = round(total_s - results["scan_phase1_s"], 1)
    results["pairs_found"] = len(pairs)
    save()

    got = {(i, j) for i, j, _ in pairs}
    planted_set = {(int(a), int(b)) for a, b in zip(src, dst)}
    found = len(planted_set & got)
    results["planted_found"] = found
    results["recall"] = round(found / args.pairs, 4)
    # legacy extrapolation for the headline comparison (dup_scan_1m.json:
    # 97-165 s at 1M, O(N^2) -> x100 at 10M)
    results["legacy_extrapolated_s"] = 9_700
    results["speedup_vs_legacy"] = round(9_700 / max(total_s, 1e-9), 1)
    save()
    log(json.dumps(results))
    assert found == args.pairs, f"recall audit FAILED: {found}/{args.pairs}"
    print(json.dumps(results))


if __name__ == "__main__":
    main()
