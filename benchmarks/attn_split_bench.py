"""Split-key attention kernel vs the shipped kernel (real TPU).

Round-3 structural experiment (PERF_NOTES round-3 idea #1): the shipped
kernel's [S, S] logits pad 257 lanes to 384 on every QK/PV matmul; the
split kernel works on [S, 256] + [S, 8] tiles instead. Chained-24-layer
protocol from attn_variants.py (amortizes tunnel dispatch).

Run: python benchmarks/attn_split_bench.py
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

    from image_search_tpu.ops.attention import (
        fused_attention_packed,
        fused_attention_split,
    )

    assert jax.default_backend() == "tpu"
    probe = jnp.ones((8, 8), jnp.bfloat16)
    float((probe @ probe)[0, 0])

    B, S, D, H, L = 160, 257, 1024, 16, 24
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, S, D)) * 0.125, jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, S, D)), jnp.bfloat16)

    def sync(x):
        return float(jnp.sum(x.ravel()[:1]))

    variants = {
        "base": lambda q_, k_, v_: fused_attention_packed(q_, k_, v_, heads=H),
        "split": lambda q_, k_, v_: fused_attention_split(q_, k_, v_, heads=H),
    }
    flops = 4 * B * H * S * S * (D // H) * L
    for name, attn in variants.items():
        @jax.jit
        def run24(q_, k_, v_, attn=attn):
            out = q_
            for _ in range(L):
                out = attn(out, k_, v_)
            return out

        try:
            for _ in range(3):
                sync(run24(q, k, v))
        except Exception as e:
            print(f"{name:6s}: FAILED ({str(e).splitlines()[0][:120]})")
            continue
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            out = None
            for _ in range(8):
                out = run24(q, k, v)
            sync(out)
            times.append((time.perf_counter() - t0) / 8)
        dt = min(times)
        print(
            f"{name:6s}: {dt*1e3:7.2f} ms /24 = {dt/L*1e3:6.3f} ms/layer "
            f"({flops/dt/1e12:5.1f} TFLOP/s)"
        )
        # numerics spot-check vs the shipped kernel
        if name == "split":
            a = np.asarray(fused_attention_packed(q, k, v, heads=H), np.float32)
            b = np.asarray(fused_attention_split(q, k, v, heads=H), np.float32)
            print(f"        max|split-base| = {np.abs(a-b).max():.5f}")


if __name__ == "__main__":
    main()
