"""E2E forward: fused LN->matmul blocks vs shipped blocks (real TPU).

Reproduces the round-2 NEGATIVE result in docs/PERF_NOTES.md ("fused
LN->matmul"): composing the ViT-L/14 batch-160 embed forward from the
Pallas LN->matmul prologue kernel (ops/ln_matmul.py) and/or the packed-qkv
attention kernel (ops/attention.py) LOSES 4-23% e2e vs the shipped
composition (standalone XLA LNs + weight-sliced projections +
attention_core), even though the kernels tie XLA standalone. The fused
block compositions live HERE (not in models/clip.py) because they lost.

Uses the dependent-scalar-fetch warm-up protocol (docs/PERF_NOTES.md
"platform pathologies").

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
    from image_search_tpu.ops.attention import attention_core, attention_qkv_packed_core
    from image_search_tpu.ops.ln_matmul import ln_matmul_core, pick_block_m

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

    def fused_qkv(x, blk, c):
        """LN1 fused into the qkv projection (Pallas), packed [B,S,3D] out."""
        Bx, S, D = x.shape
        return ln_matmul_core(
            x.reshape(Bx * S, D),
            blk["ln1_scale"], blk["ln1_bias"],
            blk["qkv_w"].astype(x.dtype), blk["qkv_b"].astype(x.dtype),
            c.layernorm_eps, pick_block_m(D, 3 * D), False,
        ).reshape(Bx, S, 3 * D)

    def fused_mlp(x, blk, c):
        """LN2 fused into the MLP fc matmul (Pallas)."""
        Bx, S, D = x.shape
        mlp_dim = blk["fc_w"].shape[-1]
        h = ln_matmul_core(
            x.reshape(Bx * S, D),
            blk["ln2_scale"], blk["ln2_bias"],
            blk["fc_w"].astype(x.dtype), blk["fc_b"].astype(x.dtype),
            c.layernorm_eps, pick_block_m(D, mlp_dim), False,
        )
        h = model_lib._act(h, c.act)
        return (
            jnp.einsum("mk,kd->md", h, blk["proj_w"].astype(x.dtype))
            + blk["proj_b"].astype(x.dtype)
        ).reshape(Bx, S, D)

    def o_proj(attn, blk, dtype):
        return jnp.einsum("bsd,de->bse", attn, blk["o_w"].astype(dtype)) + blk[
            "o_b"
        ].astype(dtype)

    def block_full_fused(x, blk, c, causal):
        H, Hd = c.num_heads, c.head_dim
        qkv = fused_qkv(x, blk, c)
        attn = attention_qkv_packed_core(qkv, H, causal, float(Hd**-0.5), False)
        x = x + o_proj(attn, blk, x.dtype)
        return x + fused_mlp(x, blk, c)

    def block_qkv_only(x, blk, c, causal):
        Bx, S, D = x.shape
        H, Hd = c.num_heads, c.head_dim
        qkv = fused_qkv(x, blk, c)
        q = qkv[..., :D] * float(Hd**-0.5)
        out = attention_core(q, qkv[..., D : 2 * D], qkv[..., 2 * D :], H, causal, 1.0, False)
        x = x + o_proj(out, blk, x.dtype)
        return x + model_lib._mlp(
            model_lib._layer_norm(x, blk["ln2_scale"], blk["ln2_bias"], c.layernorm_eps),
            blk, c,
        )

    def block_mlp_only(x, blk, c, causal):
        x = x + model_lib._attention(
            model_lib._layer_norm(x, blk["ln1_scale"], blk["ln1_bias"], c.layernorm_eps),
            blk, c, causal,
        )
        return x + fused_mlp(x, blk, c)

    shipped = model_lib._block
    dt_s, out_s = measure()
    print(f"shipped blocks    : {dt_s * 1e3:7.2f} ms  ({B / dt_s:7.1f} img/s)")
    for name, blk_fn in (
        ("fully fused", block_full_fused),
        ("ln1->qkv only", block_qkv_only),
        ("ln2->fc only", block_mlp_only),
    ):
        try:
            model_lib._block = blk_fn
            dt, out = measure()
        finally:
            model_lib._block = shipped
        cos = float(
            jnp.mean(jnp.sum(out.astype(jnp.float32) * out_s.astype(jnp.float32), -1))
        )
        print(
            f"{name:18s}: {dt * 1e3:7.2f} ms  ({B / dt:7.1f} img/s)  "
            f"cosine vs shipped {cos:.6f}"
        )


if __name__ == "__main__":
    main()
