"""Two-stage certified-exact query at 10M rows (real TPU).

The full-scan exact query is read-bound at ~640 GB/s => 12.0 ms minimum
for any one-pass method at 10M int8 rows (PERF_NOTES round-3 frontier
study). The two-stage path (index/twostage.py) reads the 256 B/row sketch
instead of the 768 B/row slab and rescores only C candidates, with a
Cauchy-Schwarz certificate that makes the result provably equal to the
full scan — so on spectrally concentrated corpora it can legally beat the
"platform floor", which only binds full-read algorithms.

Corpus: device-generated int8 rows with a rank-64-dominant spectrum
(noise 0.02) — the spectral shape of real image embeddings; plus a FLAT
control corpus where the certificate must fail and the measured cost is
bound-pass + fallback (the documented worst case).

Incremental JSON (tunnel discipline); ONE process, serialized.
Run: python benchmarks/twostage_10m.py [--rows 10000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# CPU smoke runs write to a separate file so correctness-only numbers can
# never overwrite (or be misread as) the real-TPU measurement
OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "twostage_10m.smoke.json" if os.environ.get("ISX_CPU_SMOKE") else "twostage_10m.json",
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
    ap.add_argument("--candidates", type=int, default=4096)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from image_search_tpu.index import twostage
    from image_search_tpu.index.index import _search_local, _write_block
    from image_search_tpu.parallel.sharded_search import quantize_rows_int8

    if os.environ.get("ISX_CPU_SMOKE"):
        # correctness-only dry run of the whole script on CPU (no timing
        # validity): catches harness bugs before a TPU session is spent
        jax.config.update("jax_platforms", "cpu")
        args.rows = min(args.rows, 64_000)
    else:
        assert jax.default_backend() == "tpu"
        probe = jnp.ones((8, 8), jnp.bfloat16)
        float((probe @ probe)[0, 0])

    n, d, k = args.rows, args.dim, args.k
    n_pad = -(-n // 4096) * 4096
    ch = min(1_000_000, n)
    assert n % ch == 0, (n, ch)  # generation covers every row exactly once
    results = {"rows": n, "k": k, "candidates": args.candidates}

    def save():
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    def build_corpus(concentrated: bool):
        """[n_pad, d] int8 slab + scales, generated on-device in chunks."""
        mix = jax.device_put(
            jnp.asarray(
                np.random.default_rng(7).normal(size=(args.rank, d)), jnp.float32
            )
        )

        @jax.jit
        def gen(key):
            kz, kn = jax.random.split(key)
            if concentrated:
                e = (
                    jax.random.normal(kz, (ch, args.rank), jnp.float32) @ mix
                    + args.noise * jax.random.normal(kn, (ch, d), jnp.float32)
                )
            else:
                e = jax.random.normal(kn, (ch, d), jnp.float32)
            e = e / jnp.linalg.norm(e, axis=1, keepdims=True)
            return quantize_rows_int8(e)

        buf = jnp.zeros((n_pad, d), jnp.int8)
        scl = jnp.zeros((n_pad,), jnp.float32)
        for i in range(n // ch):
            qv, sc = gen(jax.random.key(i))
            buf = _write_block(buf, qv, jnp.asarray(i * ch, jnp.int32))
            scl = _write_block(scl, sc, jnp.asarray(i * ch, jnp.int32))
        float(buf[0, 0])  # dependent fetch: generation complete
        return buf, scl, mix

    def queries(mix, concentrated: bool, b: int):
        rng = np.random.default_rng(99)
        if concentrated:
            q = rng.normal(size=(b, args.rank)).astype(np.float32) @ np.asarray(mix)
            q = q + args.noise * rng.normal(size=(b, d)).astype(np.float32)
        else:
            q = rng.normal(size=(b, d)).astype(np.float32)
        return jnp.asarray(q / np.linalg.norm(q, axis=1, keepdims=True))

    def build_sketch(buf, scl, to_bf16=False):
        t0 = time.perf_counter()
        idx = jnp.asarray(np.linspace(0, n - 1, 8192).astype(np.int32))
        from image_search_tpu.index.index import _gather_rows

        sample = np.asarray(_gather_rows((buf,), (scl,), idx), np.float32)
        basis = jnp.asarray(twostage.fit_basis(sample, 64))
        s, t, slack = twostage.sketch_slab(buf, scl, basis, to_bf16)
        float(t[0])  # sync
        return basis, s, t, slack, time.perf_counter() - t0

    def time_fn(fn, m=15):
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
    # (corpus label, concentrated?, sketch dtype tag): bf16 sketch halves
    # stage-1 bytes and is only interesting where the certificate holds,
    # so the flat control runs f32 only
    plans = [
        ("concentrated", True, ("", "bf16_")),
        ("flat", False, ("",)),
    ]
    for label, concentrated, dtags in plans:
        buf, scl, mix = build_corpus(concentrated)
        full_ms_by_b = {}
        for b in (1, 8):
            q = queries(mix, concentrated, b)
            full_ms_by_b[b] = time_fn(
                lambda: _search_local((buf,), size, q, k, (scl,), False, None)
            )
            results[f"{label}_full_b{b}_ms"] = round(full_ms_by_b[b], 2)
            save()
        for dtag in dtags:
            basis, sk, rs, slack, build_s = build_sketch(
                buf, scl, to_bf16=bool(dtag)
            )
            results[f"{label}_{dtag}sketch_build_s"] = round(build_s, 2)
            if dtag:
                results[f"{label}_{dtag}ub_slack"] = round(float(slack), 6)
            save()
            for b in (1, 8):
                q = queries(mix, concentrated, b)
                full_ms = full_ms_by_b[b]
                ts = lambda: twostage.twostage_topk(
                    (buf,), (sk,), (rs,), basis, size, q, k, args.candidates,
                    (scl,), None, slack,
                )
                ts_ms = time_fn(ts)
                vals, ids, cert = ts()
                certified = bool(jnp.all(cert))
                results[f"{label}_{dtag}twostage_b{b}_ms"] = round(ts_ms, 2)
                results[f"{label}_{dtag}certified_b{b}"] = certified
                # end-to-end cost the user sees: certified => one pass;
                # fallback => bound pass + full scan
                e2e = ts_ms if certified else ts_ms + full_ms
                results[f"{label}_{dtag}exact_e2e_b{b}_ms"] = round(e2e, 2)
                save()
                # exactness audit on the live corpus
                fs, fi = _search_local((buf,), size, q, k, (scl,), False, None)
                if certified:
                    # scores bitwise equal; ids equal as SETS per query
                    # (exact ties in the tail legitimately permute between
                    # two exact programs — observed at 64k rows, k=1000)
                    ids_np, fi_np = np.asarray(ids), np.asarray(fi)
                    same = bool(jnp.all(fs == vals)) and all(
                        set(ids_np[r]) == set(fi_np[r])
                        for r in range(ids_np.shape[0])
                    )
                    results[f"{label}_{dtag}matches_full_b{b}"] = same
                # certificate margin tau - rest_max: remaining bound slack
                # (the bf16 sketch spends ~ub_slack of the f32 margin)
                qn = q / jnp.linalg.norm(q, axis=1, keepdims=True)
                from image_search_tpu.index.twostage import (
                    SLACK, SLACK_T, _exact_query_vector)
                qt_vec, _, _ = _exact_query_vector(qn, True)
                q_s = qt_vec @ basis
                qs2 = jnp.sum(q_s * q_s, 1)
                q_res = jnp.sqrt(jnp.maximum(
                    jnp.sum(qt_vec * qt_vec, 1) - qs2, 0.0
                ) + SLACK_T)
                infl = jnp.sqrt(qs2) * slack + SLACK
                dot = jax.lax.dot_general(
                    q_s.astype(sk.dtype), sk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                ub = dot + q_res[:, None] * rs[None, :] + infl[:, None]
                ub = jnp.where(
                    jnp.arange(ub.shape[1])[None, :] < n, ub, -jnp.inf
                )
                rest_max = jnp.sort(ub, axis=1)[:, -(args.candidates + 1)]
                tau = vals[:, k - 1]
                results[f"{label}_{dtag}margin_b{b}"] = round(
                    float(jnp.min(tau - rest_max)), 5
                )
                save()
                log(json.dumps(
                    {kk: results[kk] for kk in results if label in kk}
                ))
            del sk, rs
        del buf, scl
    print(json.dumps(results))


if __name__ == "__main__":
    main()
