"""Flat-corpus duplicate scan at 10M rows: the approximate middle path
(round-4 verdict #3).

A spectrally FLAT corpus (isotropic Gaussian, no low-rank structure) is
the certified scan's worst case: residual products alone exceed dup
thresholds, nothing provably prunes, and `DupScanBailout` fires — the
round-4 fallback was the legacy per-row scan at ~2.7-4.5 HOURS
extrapolated (RESULTS.md dup_scan_1m x100). This measures the new middle
path end to end on the real chip:

  corpus   10M device-generated int8 rows, ISOTROPIC (flat) — the
           anti-spectrum of dup_scan_10m.py's rank-64 corpus.
  planted  200 exact-duplicate pairs (int8 row + scale copied), strided
           so pairs land in different blocks/slabs (+701 offset).
  certified  sketch_duplicate_pairs must BAIL OUT (timed: the cost of
           discovering the corpus is flat at scan time).
  approx   sketch_candidate_pairs (top-c blockmax candidates per block +
           exact rescore) — timed with phase split.
  audit    recall of the planted pairs (heuristic — the scan is labeled
           approximate — but exact copies top their block rows, so the
           EXPECTED recall is 200/200; the measured number is reported
           either way and asserted == 200 so a ranking regression fails
           loudly). Soundness needs no audit: emitted pairs carry true
           HIGHEST-precision f32 scores >= threshold by construction.

Target: <= 20 min total (vs hours for the legacy fallback).

ISX_CPU_SMOKE=1 runs the whole harness at 64k rows on CPU (correctness
only, separate .smoke.json output) — run this BEFORE spending a TPU
session. ONE process, serialized (tunnel discipline, CLAUDE.md).
Run: python benchmarks/dup_flat_10m.py [--rows 10000000]
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
    "dup_flat_10m.smoke.json" if os.environ.get("ISX_CPU_SMOKE") else "dup_flat_10m.json",
)

SLAB = 1 << 20


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--threshold", type=float, default=0.9)
    ap.add_argument("--pairs", type=int, default=200)
    ap.add_argument("--cands", type=int, default=8)
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
    slab_rows = min(SLAB, -(-n // 4096) * 4096)
    n_slabs = -(-n // slab_rows)
    results = {
        "rows": n, "threshold": args.threshold, "planted": args.pairs,
        "cands_per_block": args.cands,
    }

    def save():
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    # ---- corpus: per-slab device generation, ISOTROPIC ------------------
    gen_ch = min(slab_rows, 1 << 18)
    assert slab_rows % gen_ch == 0

    @jax.jit
    def gen(key):
        e = jax.random.normal(key, (gen_ch, d), jnp.float32)
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
    float(slabs[-1][0, 0])
    results["build_corpus_s"] = round(time.perf_counter() - t0, 1)
    save()
    log(f"[corpus] {n_slabs} slabs x {slab_rows} rows (flat) in "
        f"{results['build_corpus_s']}s")

    # ---- plant exact duplicate pairs (same scheme as dup_scan_10m.py) ---
    stride = max((n - 800) // args.pairs, 1)
    src = np.arange(args.pairs, dtype=np.int64) * stride
    dst = src + 701
    assert dst.max() < n
    src_rows = np.asarray(_gather_rows(tuple(slabs), tuple(scales),
                                       jnp.asarray(src, jnp.int32)))
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

    # ---- sketch build (ungated — exactly what engine._duplicate_pairs
    # does for the middle path after the certifiability gate refuses) -----
    t0 = time.perf_counter()
    samp_idx = jnp.asarray(np.linspace(0, n - 1, 8192).astype(np.int32))
    sample = np.asarray(_gather_rows(tuple(slabs), tuple(scales), samp_idx), np.float32)
    basis = jnp.asarray(twostage.fit_basis(sample, 64))
    est = twostage.estimate_certifiable_fraction(
        sample, np.asarray(basis), n, k=1000,
        candidate_rows=twostage.DEFAULT_BLOCKS * twostage.BLOCK,
        fs_slack=twostage.FULL_SCAN_SLACK["int8"], ub_slack=0.01,
    )
    results["sketch_certifiable_est"] = round(float(est), 4)
    sk_parts, rs_parts, slacks = [], [], []
    for si in range(n_slabs):
        s, t, sl = twostage.sketch_slab(slabs[si], scales[si], basis, to_bf16=True)
        sk_parts.append(s)
        rs_parts.append(t)
        slacks.append(sl)
    ub_slack = jnp.max(jnp.stack(slacks))
    float(ub_slack)
    sketch = twostage.SketchState(
        basis=basis, sketches=tuple(sk_parts), resid=tuple(rs_parts),
        built_rows=n, ub_slack=ub_slack,
    )
    results["sketch_build_s"] = round(time.perf_counter() - t0, 1)
    save()
    log(f"[sketch] built in {results['sketch_build_s']}s (certifiable_est="
        f"{results['sketch_certifiable_est']}, ub_slack={float(ub_slack):.5f})")

    # ---- certified scan: must bail out (timed) ---------------------------
    t0 = time.perf_counter()
    try:
        dupscan.sketch_duplicate_pairs(
            tuple(slabs), tuple(scales), None, n, sketch, args.threshold)
        results["certified_bailed"] = False
        log("[certified] UNEXPECTEDLY completed — corpus not flat enough?")
    except dupscan.DupScanBailout as e:
        results["certified_bailed"] = True
        results["certified_bail_reason"] = str(e)[:160]
    results["certified_bail_s"] = round(time.perf_counter() - t0, 1)
    save()
    log(f"[certified] bailed={results['certified_bailed']} in "
        f"{results['certified_bail_s']}s")

    # ---- approximate candidate scan --------------------------------------
    marks = {}

    def progress(a, b):
        if a / b >= 0.5 and "p1_end" not in marks:
            marks["p1_end"] = time.perf_counter()

    t0 = time.perf_counter()
    pairs = dupscan.sketch_candidate_pairs(
        tuple(slabs), tuple(scales), None, n, sketch, args.threshold,
        cands_per_block=args.cands, progress=progress,
    )
    total_s = time.perf_counter() - t0
    results["approx_total_s"] = round(total_s, 1)
    results["approx_phase1_s"] = round(marks.get("p1_end", t0) - t0, 1)
    results["approx_phase2_s"] = round(total_s - results["approx_phase1_s"], 1)
    results["pairs_found"] = len(pairs)
    save()

    got = {(i, j) for i, j, _ in pairs}
    planted_set = {(int(a), int(b)) for a, b in zip(src, dst)}
    found = len(planted_set & got)
    results["planted_found"] = found
    results["recall"] = round(found / args.pairs, 4)
    # legacy APPROX extrapolation (dup_scan_1m.json 97 s at 1M x100); the
    # exact legacy is ~1.7x that — this is what the middle path replaces
    results["legacy_extrapolated_s"] = 9_700
    results["speedup_vs_legacy"] = round(9_700 / max(total_s, 1e-9), 1)
    save()
    log(json.dumps(results))
    assert found == args.pairs, f"recall audit FAILED: {found}/{args.pairs}"
    print(json.dumps(results))


if __name__ == "__main__":
    main()
