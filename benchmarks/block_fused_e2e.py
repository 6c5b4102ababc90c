"""E2E forward: fused LN->matmul blocks vs round-1 blocks (real TPU).

Compares the shipped ViT-L/14 batch-160 embed forward with
models.clip._block_fused (Pallas LN->qkv matmul + packed-qkv attention)
against the round-1 composition (standalone LNs + weight-sliced projections
+ attention_core). Uses the dependent-scalar-fetch warm-up protocol
(docs/PERF_NOTES.md "platform pathologies").

Run: python benchmarks/block_fused_e2e.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu"
    probe = jnp.ones((8, 8), jnp.bfloat16)
    float((probe @ probe)[0, 0])

    from image_search_tpu.config import clip_vit_l14
    from image_search_tpu.models import clip as model_lib, init_params

    cfg = clip_vit_l14()
    params = init_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
    B = 160
    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.normal(size=(B, 224, 224, 3)), jnp.bfloat16)

    def sync(x):
        return float(jnp.sum(x.ravel()[:1]))

    def measure():
        f = jax.jit(
            lambda p, px: model_lib.encode_image(
                p, cfg, px, compute_dtype=jnp.bfloat16, normalize=True
            )
        )
        fn = lambda: f(params, pixels)
        for _ in range(3):
            sync(fn())
        best = None
        for _ in range(4):
            t0 = time.perf_counter()
            out = None
            for _ in range(20):
                out = fn()
            sync(out)
            dt = (time.perf_counter() - t0) / 20
            best = dt if best is None else min(best, dt)
        return best, out

    def round1_block(x, blk, c, causal):
        x = x + model_lib._attention(
            model_lib._layer_norm(x, blk["ln1_scale"], blk["ln1_bias"], c.layernorm_eps),
            blk, c, causal,
        )
        x = x + model_lib._mlp(
            model_lib._layer_norm(x, blk["ln2_scale"], blk["ln2_bias"], c.layernorm_eps),
            blk, c,
        )
        return x

    fused = model_lib._block_fused
    dt_f, out_f = measure()
    print(f"fused blocks  : {dt_f * 1e3:7.2f} ms  ({B / dt_f:7.1f} img/s)")
    try:
        model_lib._block_fused = round1_block
        dt_r, out_r = measure()
    finally:
        model_lib._block_fused = fused
    print(f"round-1 blocks: {dt_r * 1e3:7.2f} ms  ({B / dt_r:7.1f} img/s)")
    cos = float(
        jnp.mean(jnp.sum(out_f.astype(jnp.float32) * out_r.astype(jnp.float32), -1))
    )
    print(f"mean cosine fused vs round-1 (both L2-normed): {cos:.6f}")


if __name__ == "__main__":
    main()
