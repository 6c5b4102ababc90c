"""Serving-latency decomposition at 10M rows — fused one-program path.

Round-3 verdict #1: stop PROJECTING the <15 ms over-the-wire budget —
demonstrate it. The serving path is now ONE dispatched XLA program
(token ids -> ViT-L text tower -> Rocchio -> certified two-stage
bound+rescore, index._fused_twostage_fn) with ONE host round trip
(certificate + scores + ids fetched together), and the response body is
pre-rendered (engine.render_images_json). This script measures every
stage on the real chip and publishes the tunnel accounting:

  tunnel_rtt        p50 of jax.device_get on a READY tiny array — a pure
                    transfer round trip through the axon tunnel. On a
                    TPU-VM this is a PCIe hop (~0.1-0.3 ms); in this
                    sandbox it is the tunnel floor (tens of ms).
  host_tokenize     BPE encode (real trained vocab, not the hash stub)
  device_tower_b8   text tower alone at the serving pad (Bpad=8),
                    amortized protocol
  device_fused      the WHOLE fused serving program, amortized protocol
                    (N async dispatches + one dependent fetch — pure
                    device time, no tunnel in the quotient)
  fused_single      one index.search_twostage_fused_tokens call =
                    device_fused + exactly ONE tunnel_rtt
  host_format       k=1000 wire-dict formatting (memoized templates)
  host_render       k=1000 pre-rendered JSON body (memoized fragments)
  engine_e2e        engine.search(q), cold distinct queries (fused path)
  http_e2e          loopback POST /search through the real aiohttp app

Tunnel-RTT subtraction methodology (the loopback claim): the serving
path performs exactly one device round trip per request — the fused
program's combined device_get; every other device interaction is an
async dispatch that never blocks. Therefore

    wire_p50 = http_e2e_p50 - tunnel_rtt_p50

is the loopback p50 with the sandbox tunnel's transfer floor replaced
by zero; a TPU-VM adds its own PCIe rtt back (~0.1-0.3 ms). The
cross-check published alongside: http_e2e ≈ device_fused + host stages
+ tunnel_rtt must close to within noise, or the subtraction is wrong.

Corpus: device-generated int8 rows with the rank-64-dominant spectrum
of real image embeddings (same generator as twostage_10m.py; the flat
control lives there — a flat corpus never publishes a sketch since the
round-4 certifiability gate). bf16 sketch (the shipped fast config).

ISX_CPU_SMOKE=1 runs the whole harness at 64k rows on CPU (correctness
of the harness only; writes latency_decomp.smoke.json).
ONE process, serialized (tunnel discipline, CLAUDE.md).
Run: python benchmarks/latency_decomp.py [--rows 10000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMOKE = bool(os.environ.get("ISX_CPU_SMOKE"))
OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "latency_decomp.smoke.json" if SMOKE else "latency_decomp.json",
)

QUERIES = [
    "a dog on a beach at sunset",
    "red vintage car in the rain",
    "snow covered mountain cabin",
    "children playing football",
    "close-up of a bee on a flower",
]


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def p50(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--rank", type=int, default=64)
    ap.add_argument("--noise", type=float, default=0.02)
    ap.add_argument("--queries", type=int, default=30)
    ap.add_argument("--k", type=int, default=1000)
    ap.add_argument("--sketch-dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
        args.rows = min(args.rows, 64_000)
        args.queries = min(args.queries, 8)
    else:
        assert jax.default_backend() == "tpu"
        probe = jnp.ones((8, 8), jnp.bfloat16)
        float((probe @ probe)[0, 0])
        log("[probe] ok")

    from synth_corpus import build_engine

    engine, embedder, tokenizer, params, cfg, index = build_engine(
        args.rows, args.k, args.sketch_dtype, rank=args.rank, noise=args.noise
    )
    n = args.rows

    n_q = args.queries
    stages = {}
    counters = {}
    results = {
        "rows": n,
        "k": args.k,
        "sketch_dtype": args.sketch_dtype,
        "stages_ms": stages,
    }

    def save():
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    # ---- tunnel rtt: dispatch+fetch of a FRESH tiny array each probe.
    # jax caches the host copy after the first device_get of an array, so
    # re-fetching the same buffer measures a dict lookup, not the tunnel
    # (first version of this probe read 0.005 ms against a ~30 ms floor).
    # A fresh add is sub-microsecond of device work: the probe is one
    # dispatch + one transfer = one round trip.
    base = jnp.arange(8.0)
    base.block_until_ready()

    @jax.jit
    def bump(x, i):
        return x + i

    jax.device_get(bump(base, 1))
    t = []
    for i in range(50):
        t0 = time.perf_counter()
        jax.device_get(bump(base, i))
        t.append(time.perf_counter() - t0)
    stages["tunnel_rtt"] = p50(t) * 1e3
    log(f"[rtt] {stages['tunnel_rtt']:.3f} ms")
    save()

    # payload-size rtt ladder (round-5): the serving fetch is ~8 KB (cert
    # + k=1000 scores + ids), not the 32 B the base probe moves — if the
    # tunnel charges per byte, the closure residual is TRANSFER, not an
    # unaccounted stage. rtt_payload below feeds the closure.
    rtt_ladder = {}
    for sz in (8, 256, 2048, 16384, 262144):
        arr = jnp.arange(float(sz))
        arr.block_until_ready()
        jax.device_get(bump(arr, 1))
        t = []
        for i in range(20):
            t0 = time.perf_counter()
            jax.device_get(bump(arr, i))
            t.append(time.perf_counter() - t0)
        rtt_ladder[str(sz * 4)] = round(p50(t) * 1e3, 3)
    results["tunnel_rtt_by_payload_bytes"] = rtt_ladder
    log(f"[rtt-ladder] {rtt_ladder}")
    # the fused B=1 response: 1 cert byte-ish + k f32 scores + k i32 ids
    stages["tunnel_rtt_payload"] = rtt_ladder[str(2048 * 4)]
    save()

    # ---- host stages ----------------------------------------------------
    qs = [f"{QUERIES[i % len(QUERIES)]} {i}" for i in range(n_q)]
    t = []
    for q in qs:
        t0 = time.perf_counter()
        tokenizer([q])
        t.append(time.perf_counter() - t0)
    stages["host_tokenize"] = p50(t) * 1e3

    # ---- device stages (amortized protocol: N async dispatches + one
    # dependent fetch; dispatch pipelining keeps the tunnel out) ----------
    ids1 = tokenizer([qs[0]])
    ids1_dev = jnp.asarray(ids1)
    text_fn = embedder.encode_text_fn

    def amortized(fn, out_leaf, reps):
        fn()  # compile/warm
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for _ in range(reps):
                out = fn()
            float(np.asarray(out_leaf(out)).ravel()[0])
            dt = (time.perf_counter() - t0) / reps
            best = dt if best is None else min(best, dt)
        return best * 1e3

    stages["device_tower_b1"] = amortized(
        lambda: text_fn(params, input_ids=ids1_dev), lambda o: o, 20
    )
    save()

    # the exact fused program the engine serves with (same cache key path)
    sk, k2, c, slabs, norms, scales, pens, size, _ = index._twostage_snapshot(
        args.k, 4096, [[]]
    )
    from image_search_tpu.index.index import _fused_twostage_fn
    from image_search_tpu.index.twostage import BLOCK

    nb = sum(s_.shape[0] for s_ in slabs) // BLOCK
    per_q = c // 2 if sk.sketches[0].dtype == jnp.bfloat16 else c // 4
    m = min(max(c, per_q), nb - 1)
    # Bpad=1: the program a lone HTTP request actually runs (the old
    # Bpad=8 pad measured +9 ms of selection work at 10M)
    fused = _fused_twostage_fn(text_fn, k2, m, 1)
    sel = jnp.full((1, 8), -1, jnp.int32)
    fargs = (
        params, ids1_dev, sel, slabs, norms, scales, pens, size,
        sk.sketches, sk.resid, sk.basis, sk.ub_slack,
    )
    stages["device_fused"] = amortized(
        lambda: fused(*fargs), lambda o: o[0], 15
    )
    s_, i_, cert_, _t = fused(*fargs)
    counters["amortized_fused_certified"] = bool(jax.device_get(cert_))
    save()

    # single fused call through the index API: device_fused + ONE rtt
    t = []
    for i in range(n_q):
        ids = tokenizer([qs[i]])
        t0 = time.perf_counter()
        s_np, i_np, text = index.search_twostage_fused_tokens(
            text_fn, params, ids, [[]], args.k
        )
        t.append(time.perf_counter() - t0)
    stages["fused_single"] = p50(t) * 1e3
    counters["fused_single_certified"] = int(index.twostage_certified)
    counters["fused_single_fallbacks"] = int(index.twostage_fallbacks)
    save()

    # ---- dispatch-only probes (round-4 verdict #2: decompose the ~5 ms
    # residual the closure cross-check left unexplained) ------------------
    # (a) enqueue cost of the compiled fused program on READY device
    # inputs, never fetching: pure host-side trace-cache lookup + argument
    # staging + async dispatch. This is the per-request jax overhead that
    # sits in http_e2e but in NEITHER device_fused (amortized out) nor
    # tunnel_rtt.
    float(np.asarray(fused(*fargs)[0]).ravel()[0])  # drain the queue
    t = []
    for _ in range(30):
        t0 = time.perf_counter()
        out = fused(*fargs)
        t.append(time.perf_counter() - t0)
    stages["dispatch_enqueue"] = p50(t) * 1e3
    float(np.asarray(out[0]).ravel()[0])  # drain before the next stage
    # (b) host->device enqueue of a fresh (1,77) int32 token batch — the
    # per-request input transfer. Async on this backend (timed cost is the
    # host-side staging; the bytes ride the same tunnel as the dispatch
    # stream without blocking it).
    ids_np = [np.asarray(tokenizer([qs[i % len(qs)]])) for i in range(30)]
    t = []
    for a in ids_np:
        t0 = time.perf_counter()
        dev = jax.device_put(a)
        t.append(time.perf_counter() - t0)
    dev.block_until_ready()
    stages["h2d_ids_enqueue"] = p50(t) * 1e3
    save()

    # ---- host formatting stages ----------------------------------------
    out_rows = engine._format_results(s_np[:1][0], i_np[:1][0])
    t = []
    for _ in range(n_q):
        t0 = time.perf_counter()
        out_rows = engine._format_results(s_np[0], i_np[0])
        t.append(time.perf_counter() - t0)
    stages["host_format"] = p50(t) * 1e3
    t = []
    for _ in range(n_q):
        t0 = time.perf_counter()
        engine.render_images_json(out_rows)
        t.append(time.perf_counter() - t0)
    stages["host_render"] = p50(t) * 1e3
    save()

    # ---- engine e2e (cold -> fused path) --------------------------------
    engine.search(qs[0])  # warm every compiled serving bucket
    t = []
    for i in range(n_q):
        q = f"engine cold {i} {QUERIES[i % len(QUERIES)]}"
        t0 = time.perf_counter()
        engine.search(q)
        t.append(time.perf_counter() - t0)
    stages["engine_e2e"] = p50(t) * 1e3
    from image_search_tpu.utils.metrics import global_metrics

    counters["engine_fused_searches"] = global_metrics.snapshot()["counters"].get(
        "fused_searches", 0
    )
    save()

    # engine-overhead probe (round-5): time the INNER index call from
    # inside engine.search so engine bookkeeping (caches, selection
    # resolution, gauges, formatting) is separated from the fused
    # dispatch+fetch — localizes the engine_e2e - fused_single delta
    inner_t = []
    orig_fused = index.search_twostage_fused_tokens

    def timed_fused(*a, **kw):
        t0 = time.perf_counter()
        out = orig_fused(*a, **kw)
        inner_t.append(time.perf_counter() - t0)
        return out

    index.search_twostage_fused_tokens = timed_fused
    t = []
    try:
        for i in range(n_q):
            q = f"engine probe {i} {QUERIES[i % len(QUERIES)]}"
            t0 = time.perf_counter()
            engine.search(q)
            t.append(time.perf_counter() - t0)
    finally:
        index.search_twostage_fused_tokens = orig_fused
    stages["engine_inner_index"] = p50(inner_t) * 1e3
    stages["engine_around_index"] = (p50(t) - p50(inner_t)) * 1e3
    log(f"[engine] inner {stages['engine_inner_index']:.2f} ms, "
        f"around {stages['engine_around_index']:.2f} ms")
    save()

    # ---- loopback HTTP through the real app ------------------------------
    import asyncio
    import io

    from aiohttp import web as aioweb
    from aiohttp.test_utils import TestClient, TestServer

    from image_search_tpu.server.app import build_app

    def pctl(xs, q):
        xs = sorted(xs)
        return xs[min(len(xs) - 1, int(q * len(xs)))]

    # Rocchio-feedback marks: real corpus rows. synth_corpus leaves the 10M
    # path->row dict unbuilt (2 GB host RAM); register just the marked rows.
    mark_rows = [123_456 % n, (2 * n) // 3, n - 7]
    for r in mark_rows:
        index._row[index._paths[r]] = r
    marks = [engine.to_media_path(index._paths[r]) for r in mark_rows]

    # query-by-image payload: an in-memory JPEG through the real decoder
    from PIL import Image

    rng = np.random.default_rng(3)
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 255, (480, 640, 3), np.uint8)).save(
        buf, format="JPEG", quality=90
    )
    jpeg_bytes = buf.getvalue()

    n_http = max(n_q, 10 if SMOKE else 100)
    http = {}

    async def drive():
        app = build_app(engine)
        # framing probe: a canned response body of the SAME size as a
        # k=1000 search answer, no engine behind it — isolates aiohttp
        # parse/route/respond + event-loop hops from everything device
        canned = engine.render_images_json(out_rows)

        async def echo(request: aioweb.Request) -> aioweb.Response:
            await request.read()
            return aioweb.Response(body=canned, content_type="application/json")

        app.router.add_post("/bench_echo", echo)
        c = TestClient(TestServer(app))
        await c.start_server()

        async def series(name, make_req, count, warm=1):
            for _ in range(warm):
                r = await make_req(0)
                await r.read()
            # route accounting: does this series stay on the certified
            # two-stage path or fall back to the full scan? (fb-3's +3 ms
            # over fb-1 is either gather work or certificate misses —
            # the counters decide which.)
            cert0 = int(index.twostage_certified)
            fall0 = int(index.twostage_fallbacks)
            lat = []
            for i in range(count):
                t0 = time.perf_counter()
                r = await make_req(i + 1)
                body = await r.read()
                lat.append(time.perf_counter() - t0)
                assert r.status == 200 and len(body) > 1000, (name, r.status)
            http[name] = {
                "p50_ms": round(pctl(lat, 0.50) * 1e3, 3),
                "p95_ms": round(pctl(lat, 0.95) * 1e3, 3),
                "p99_ms": round(pctl(lat, 0.99) * 1e3, 3),
                "certified": int(index.twostage_certified) - cert0,
                "fallbacks": int(index.twostage_fallbacks) - fall0,
                "n": count,
            }
            log(f"[http] {name}: {http[name]}")

        try:
            await series(
                "echo_framing",
                lambda i: c.post("/bench_echo", json={"q": f"echo {i}"}),
                n_http,
            )
            await series(
                "search_plain",
                lambda i: c.post("/search", json={"q": f"http probe {i}"}),
                n_http,
            )
            # feedback rides the same fused program; its selection gather
            # is the only extra work (round-4 verdict #2 asked for these)
            await series(
                "search_feedback_1",
                lambda i: c.post(
                    "/search",
                    json={"q": f"fb1 probe {i}", "referenced_images": marks[:1]},
                ),
                n_http,
            )
            await series(
                "search_feedback_3",
                lambda i: c.post(
                    "/search",
                    json={"q": f"fb3 probe {i}", "referenced_images": marks},
                ),
                n_http,
            )
            # query-by-image: decode + vision tower (B=1) + fused search.
            # One warm call compiles the vision bucket outside the window.
            await series(
                "search_image",
                lambda i: c.post("/search_image", data=jpeg_bytes),
                max(10, n_http // 3),
                warm=2,
            )
        finally:
            await c.close()

    asyncio.new_event_loop().run_until_complete(drive())
    results["http_ms"] = http
    stages["http_e2e"] = http["search_plain"]["p50_ms"]

    # ---- accounting -------------------------------------------------------
    host_total = (
        stages["host_tokenize"] + stages["host_format"] + stages["host_render"]
    )
    # ONE device round trip per request (module docstring): subtracting a
    # single tunnel rtt from the loopback p50 removes the sandbox's
    # transfer floor and nothing else
    wire = stages["http_e2e"] - stages["tunnel_rtt"]
    closure = (
        stages["device_fused"] + host_total + stages["tunnel_rtt"]
    )
    # round-4 verdict #2: the closure gap is now measured, not attributed —
    # aiohttp framing (echo probe, minus its own negligible handler),
    # per-request jax dispatch, and the input-transfer enqueue
    framing = results["http_ms"]["echo_framing"]["p50_ms"]
    closure_full = (
        closure + framing + stages["dispatch_enqueue"] + stages["h2d_ids_enqueue"]
    )
    # closure with the PAYLOAD-sized rtt (the fused fetch moves ~8 KB, not
    # the base probe's 32 B): if this closes where closure_full doesn't,
    # the residual is tunnel per-byte transfer, removed on a TPU-VM's PCIe
    closure_payload = (
        closure_full - stages["tunnel_rtt"] + stages["tunnel_rtt_payload"]
    )
    results["derived_ms"] = {
        "host_total": round(host_total, 3),
        "wire_p50_tunnel_subtracted": round(wire, 3),
        "wire_p95_tunnel_subtracted": round(
            results["http_ms"]["search_plain"]["p95_ms"] - stages["tunnel_rtt"], 3
        ),
        "wire_p99_tunnel_subtracted": round(
            results["http_ms"]["search_plain"]["p99_ms"] - stages["tunnel_rtt"], 3
        ),
        "wire_feedback1_p50_tunnel_subtracted": round(
            results["http_ms"]["search_feedback_1"]["p50_ms"] - stages["tunnel_rtt"], 3
        ),
        "wire_feedback3_p50_tunnel_subtracted": round(
            results["http_ms"]["search_feedback_3"]["p50_ms"] - stages["tunnel_rtt"], 3
        ),
        "wire_image_p50_tunnel_subtracted": round(
            results["http_ms"]["search_image"]["p50_ms"] - stages["tunnel_rtt"], 3
        ),
        "closure_device_plus_host_plus_rtt": round(closure, 3),
        "closure_vs_http_e2e_gap": round(stages["http_e2e"] - closure, 3),
        "closure_full": round(closure_full, 3),
        "closure_full_vs_http_e2e_gap": round(
            stages["http_e2e"] - closure_full, 3
        ),
        "closure_payload_rtt": round(closure_payload, 3),
        "closure_payload_vs_http_e2e_gap": round(
            stages["http_e2e"] - closure_payload, 3
        ),
    }
    results["counters"] = counters
    results["stages_ms"] = {k: round(v, 3) for k, v in stages.items()}
    save()
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
