"""Forward-pass cost ladder (real TPU): stub one component at a time and
measure the e2e delta at ViT-L/14 batch 160. Tells where the non-attention
126.8 ms actually goes (VERDICT round-2 item #3 groundwork).

Run: python benchmarks/fwd_ladder.py
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

    def measure(fn, iters=20, reps=4):
        for _ in range(3):
            sync(fn())
        t0 = time.perf_counter()
        out = None
        for _ in range(4):
            out = fn()
        sync(out)
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn()
            sync(out)
            dt = (time.perf_counter() - t0) / iters
            best = dt if best is None else min(best, dt)
        return best

    def fwd():
        f = jax.jit(
            lambda p, px: model_lib.encode_image(
                p, cfg, px, compute_dtype=jnp.bfloat16, normalize=True
            )
        )
        return measure(lambda: f(params, pixels))

    base = fwd()
    print(f"full forward      : {base * 1e3:7.2f} ms  ({B / base:7.1f} img/s)")

    def stub(name, **patches):
        saved = {k: getattr(model_lib, k) for k in patches}
        try:
            for k, fn in patches.items():
                setattr(model_lib, k, fn)
            dt = fwd()
        finally:
            for k, fn in saved.items():
                setattr(model_lib, k, fn)
        print(
            f"{name:18s}: {dt * 1e3:7.2f} ms  (component cost: "
            f"{(base - dt) * 1e3:6.2f} ms = {100 * (base - dt) / base:5.1f}%)"
        )

    stub("act=identity", _act=lambda x, kind: x)
    stub(
        "ln=identity",
        _layer_norm=lambda x, scale, bias, eps: x,
    )
    # MLP entirely removed (bounds MLP cost incl. its HBM traffic)
    stub("mlp=identity", _mlp=lambda x, blk, cfg: x)

    # attention core stubbed (q,k proj DCEd too — known 46.8 ms)
    from image_search_tpu.ops import attention as attn_mod

    real = attn_mod.attention_core
    try:
        attn_mod.attention_core = lambda q, k, v, *a, **kw: v
        dt = fwd()
        print(
            f"{'attn=identity':18s}: {dt * 1e3:7.2f} ms  (component cost: "
            f"{(base - dt) * 1e3:6.2f} ms = {100 * (base - dt) / base:5.1f}%)"
        )
    finally:
        attn_mod.attention_core = real


if __name__ == "__main__":
    main()
