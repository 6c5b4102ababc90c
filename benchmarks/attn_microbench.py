"""Attention-kernel microbenchmark (real TPU) — VERDICT round-2 item #3.

Measures, at ViT-L/14 shapes (B=160, S=257, D=1024, H=16, bf16):
  1. the full embed forward (the 920 img/s headline),
  2. a forward with the attention core replaced by identity (upper bound on
     what attention surgery can buy),
  3. the Pallas kernel standalone vs the plain-XLA oracle,
so kernel variants can be judged by their *end-to-end* effect, not just
standalone time. Uses the dependent-scalar-fetch warm-up protocol from
docs/PERF_NOTES.md ("platform pathologies") — block_until_ready lies here.

Run: python benchmarks/attn_microbench.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu", "microbench needs the real chip"

    # probe with a tiny matmul before any heavy allocation (tunnel-wedge hazard)
    probe = jnp.ones((8, 8), jnp.bfloat16)
    float((probe @ probe)[0, 0])
    print("tpu probe ok")

    from image_search_tpu.config import clip_vit_l14
    from image_search_tpu.models import clip as model_lib, init_params

    cfg = clip_vit_l14()
    params = init_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
    B, S, D, H = 160, 257, 1024, 16

    rng = np.random.default_rng(0)
    pixels = jnp.asarray(
        rng.normal(size=(B, 224, 224, 3)).astype(np.float32), jnp.bfloat16
    )

    def sync(out):
        return float(jnp.sum(out.ravel()[:1]))

    def burst(fn, *args, iters=20):
        out = None
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        return (time.perf_counter() - t0) / iters

    def measure(fn, *args, iters=20, reps=4):
        for _ in range(3):
            sync(fn(*args))
        burst(fn, *args, iters=4)  # warm dispatch path
        return min(burst(fn, *args, iters=iters) for _ in range(reps))

    # ---- 1. full forward ---------------------------------------------------
    @jax.jit
    def embed(params, px):
        return model_lib.encode_image(
            params, cfg, px, compute_dtype=jnp.bfloat16, normalize=True
        )

    dt = measure(embed, params, pixels)
    print(f"full forward: {dt * 1e3:8.2f} ms  ({B / dt:7.1f} img/s)")

    # ---- 2. forward with attention core stubbed to identity ----------------
    import image_search_tpu.models.clip as clip_mod
    from image_search_tpu.ops import attention as attn_mod

    real_core = attn_mod.attention_core
    try:
        attn_mod.attention_core = lambda q, k, v, *a, **kw: v

        @jax.jit
        def embed_noattn(params, px):
            return model_lib.encode_image(
                params, cfg, px, compute_dtype=jnp.bfloat16, normalize=True
            )

        dt_no = measure(embed_noattn, params, pixels)
        print(
            f"fwd, attn=identity: {dt_no * 1e3:8.2f} ms  "
            f"(attention core share: {(dt - dt_no) * 1e3:.2f} ms = "
            f"{100 * (dt - dt_no) / dt:.1f}%)"
        )
    finally:
        attn_mod.attention_core = real_core

    # ---- 3. kernel standalone vs oracle ------------------------------------
    q = jnp.asarray(rng.normal(size=(B, S, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, S, D)), jnp.bfloat16)

    from image_search_tpu.ops.attention import (
        attention_reference,
        fused_attention_packed,
    )

    kern = jax.jit(
        functools.partial(fused_attention_packed, heads=H, sm_scale=1.0)
    )
    dt_k = measure(kern, q, k, v)
    # matmul flops only (QK + PV), f32-softmax VPU work excluded
    flops = 4 * B * H * S * S * (D // H)
    print(
        f"pallas kernel: {dt_k * 1e3:8.2f} ms  "
        f"({flops / dt_k / 1e12:.1f} TFLOP/s matmul)"
    )

    @jax.jit
    def oracle(q, k, v):
        r = attention_reference(
            q.reshape(B, S, H, D // H),
            k.reshape(B, S, H, D // H),
            v.reshape(B, S, H, D // H),
        )
        return r.reshape(B, S, D)

    dt_o = measure(oracle, q, k, v)
    print(f"xla oracle:   {dt_o * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
