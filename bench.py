"""Benchmark: ViT-L/14 image-embedding throughput on one chip.

Prints exactly ONE JSON line to stdout:
    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is
measured against the BASELINE.json north-star target of 10,000 images/sec/chip
for ViT-L/14 embedding on v5e. Physics note: ViT-L/14 at 224px is ~162
GFLOPs/image forward, so 10k img/s needs ~1.6 PFLOP/s — 8x a v5e chip's bf16
peak (197 TFLOP/s). The speed-of-light on this hardware is ~1.2k img/s at
100% MFU; MFU is what this benchmark actually optimizes.

Secondary metrics (query latency, preprocess overhead) go to stderr.
"""

from __future__ import annotations

import json
from functools import partial
import statistics
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def bench_embed(batch_size: int = 160, iters: int = 20, warmup: int = 3):
    import jax
    import jax.numpy as jnp

    from image_search_tpu.config import clip_vit_l14
    from image_search_tpu.models import clip as model_lib, init_params
    from image_search_tpu.ops.preprocess import fused_preprocess, pack_batch

    cfg = clip_vit_l14()
    params = init_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)

    from image_search_tpu.utils.tpu import embed_compiler_options

    @partial(jax.jit, compiler_options=embed_compiler_options())
    def embed(params, u8, A_h, A_w):
        pixels = fused_preprocess(u8, A_h, A_w, mode="hf", out_dtype=jnp.bfloat16)
        return model_lib.encode_image(
            params, cfg, pixels, compute_dtype=jnp.bfloat16, normalize=True
        )

    # realistic input geometry: 256px-bucket uint8 camera thumbnails;
    # resize weights computed on host exactly as ingest does
    rng = np.random.default_rng(0)
    images = [
        rng.integers(0, 256, size=(256, 256, 3), dtype=np.uint8)
        for _ in range(batch_size)
    ]
    u8, A_h, A_w = pack_batch(images, size=cfg.vision.image_size, mode="hf")
    # keep data device-resident: the loop measures chip throughput, not the
    # host link (the ingest pipeline overlaps transfers with compute anyway)
    u8d, ahd, awd = jnp.asarray(u8), jnp.asarray(A_h), jnp.asarray(A_w)

    # On tunneled backends block_until_ready can ack at dispatch, so sync by
    # fetching a scalar that depends on the output (forces full execution).
    def sync(out):
        return float(jnp.sum(out[-1]))

    for _ in range(warmup):
        sync(embed(params, u8d, ahd, awd))

    # time a pipelined burst: N async dispatches + one dependent fetch; the
    # device executes them back-to-back, amortizing host/tunnel latency
    def timed_burst(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = embed(params, u8d, ahd, awd)
        sync(out)
        return time.perf_counter() - t0

    timed_burst(2)  # warm the dispatch path
    times = [timed_burst(iters) / iters for _ in range(5)]
    dt = min(times)
    ips = batch_size / dt
    flops_per_image = 162e9  # ViT-L/14 @ 224px forward
    log(
        f"embed: batch={batch_size} median={dt * 1e3:.2f}ms -> {ips:.1f} img/s "
        f"(~{ips * flops_per_image / 1e12:.1f} TFLOP/s model compute)"
    )
    return ips


def bench_query(k: int = 1000):
    """Secondary: text->top-k latency over device-resident corpora.

    Corpora are generated ON-device in 1M-row chunks (uploading GBs through
    a tunneled backend is not what we're measuring, and generate-then-
    quantize in one piece would OOM the 16 GB chip); the search kernel is
    the same one VectorIndex compiles.
    """
    import jax
    import jax.numpy as jnp

    from image_search_tpu.index.index import _search_local, _write_block
    from image_search_tpu.parallel.sharded_search import quantize_rows_int8

    dim = 768
    q = jax.device_put(np.random.default_rng(1).normal(size=(1, dim)).astype(np.float32))

    def measure(emb, scales, n):
        size = jnp.asarray(n, jnp.int32)

        def burst(m=15):
            t0 = time.perf_counter()
            s = None
            for _ in range(m):
                s, _ = _search_local(
                    (emb,), size, q, k, None if scales is None else (scales,)
                )
            float(s[0, 0])  # dependent fetch = true sync on tunneled backends
            return (time.perf_counter() - t0) / m

        burst(2)  # compile + warm
        return min(burst() for _ in range(3)) * 1e3

    # f32 exact at 2M (6 GB)
    n = 2_000_000
    ch = 1_000_000

    @jax.jit
    def gen_f32(key):
        e = jax.random.normal(key, (ch, dim), jnp.float32)
        return e / jnp.linalg.norm(e, axis=1, keepdims=True)

    emb = jnp.zeros((n, dim), jnp.float32)
    for i in range(n // ch):
        emb = _write_block(emb, gen_f32(jax.random.key(i)), jnp.asarray(i * ch, jnp.int32))
    emb.block_until_ready()
    ms = measure(emb, None, n)
    log(f"query: f32 top-{k} over {n:,} vectors device={ms:.2f}ms")
    del emb

    # int8 at 10M (7.7 GB) — the BASELINE config-#4 corpus on ONE chip.
    # Production slab geometry: slabs are granule-aligned (multiples of the
    # 4096-row append block, index.py), live rows masked by `size` — the
    # alignment also admits the Pallas streaming score kernel
    # (ops/score_stream.py), exactly as a real 10M index does.
    n = 10_000_000
    n_pad = -(-n // 4096) * 4096

    @jax.jit
    def gen_int8(key):
        e = jax.random.normal(key, (ch, dim), jnp.float32)
        e = e / jnp.linalg.norm(e, axis=1, keepdims=True)
        return quantize_rows_int8(e)

    buf = jnp.zeros((n_pad, dim), jnp.int8)
    scl = jnp.zeros((n_pad,), jnp.float32)
    for i in range(n // ch):
        qi, sc = gen_int8(jax.random.key(i))
        buf = _write_block(buf, qi, jnp.asarray(i * ch, jnp.int32))
        scl = _write_block(scl, sc, jnp.asarray(i * ch, jnp.int32))
    buf.block_until_ready()
    ms = measure(buf, scl, n)
    log(f"query: int8 top-{k} over {n:,} vectors device={ms:.2f}ms (single chip)")
    return ms


def _init_device(timeout_s: float = 600.0):
    """Bounded backend init. A wedged axon tunnel hangs ~30 min per attempt
    before erroring UNAVAILABLE (observed repeatedly); first contact on a
    HEALTHY tunnel takes up to ~5 min. Probe in a daemon thread so the
    driver's bench run fails fast with a clear message instead of soaking
    its whole time budget — exiting before any compile is dispatched is
    safe (the mid-compile-kill wedge hazard doesn't apply)."""
    import threading

    out: dict = {}

    def probe():
        try:
            import jax

            out["dev"] = jax.devices()[0]
        except Exception as err:  # UNAVAILABLE from a wedged tunnel
            out["err"] = err

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "dev" in out:
        return out["dev"]
    reason = out.get(
        "err", f"backend init still hung after {timeout_s:.0f}s (tunnel wedged?)"
    )
    log(f"FATAL: no usable device: {reason}")
    raise SystemExit(3)


def main() -> None:
    dev = _init_device()
    log(f"device: {dev} ({dev.platform})")
    ips = bench_embed()
    try:
        bench_query()
    except Exception as err:  # secondary metric must not sink the benchmark
        log(f"query bench skipped: {err}")
    print(
        json.dumps(
            {
                "metric": "ViT-L/14 image embed throughput (uint8 -> fused preprocess -> bf16 tower), single chip",
                "value": round(ips, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(ips / 10_000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
