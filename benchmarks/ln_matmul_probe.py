"""Probe: fused LN->matmul Pallas kernel vs XLA LN-then-matmul (real TPU).

Shapes from ViT-L/14 batch 160 (M = 160*257 = 41120 flattened rows):
  qkv: K=1024, N=3072, block_m=512
  fc : K=1024, N=4096, block_m=256  (VMEM budget)

Run: python benchmarks/ln_matmul_probe.py
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

    from image_search_tpu.ops.ln_matmul import ln_matmul, ln_matmul_reference

    def sync(x):
        return float(jnp.sum(x.ravel()[:1]))

    rng = np.random.default_rng(0)
    M, K = 41120, 1024
    for N, bm in ((3072, 512), (4096, 256)):
        x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(K, N)) * 0.02, jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(N,)) * 0.02, jnp.bfloat16)
        ls = jnp.asarray(rng.normal(size=(K,)) * 0.1 + 1.0, jnp.float32)
        lb = jnp.asarray(rng.normal(size=(K,)) * 0.1, jnp.float32)

        # chain 8 calls in one jit: output row-slice feeds nothing (shapes
        # differ), so chain via adding a cheap scalar derived from out
        import functools

        fused = functools.partial(ln_matmul, eps=1e-5, block_m=bm)

        @jax.jit
        def run8_fused(x, ls, lb, w, b):
            out = None
            xx = x
            for _ in range(8):
                out = fused(xx, ls, lb, w, b)
                xx = x + out[:1, :1].astype(x.dtype)  # serialize cheaply
            return out

        @jax.jit
        def run8_xla(x, ls, lb, w, b):
            out = None
            xx = x
            for _ in range(8):
                out = ln_matmul_reference(xx, ls, lb, w, b)
                xx = x + out[:1, :1].astype(x.dtype)
            return out

        flops = 2 * M * K * N * 8
        for name, fn in (("xla", run8_xla), ("pallas", run8_fused)):
            for _ in range(3):
                sync(fn(x, ls, lb, w, b))
            best = None
            for _ in range(4):
                t0 = time.perf_counter()
                out = None
                for _ in range(4):
                    out = fn(x, ls, lb, w, b)
                sync(out)
                dt = (time.perf_counter() - t0) / 4 / 8
                best = dt if best is None else min(best, dt)
            print(
                f"N={N} {name:7s}: {best * 1e3:7.3f} ms/call "
                f"({2 * M * K * N / best / 1e12:6.1f} TFLOP/s)"
            )
        # parity
        a = ln_matmul(x, ls, lb, w, b, block_m=bm)
        r = ln_matmul_reference(x, ls, lb, w, b)
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - r.astype(jnp.float32))))
        print(f"N={N} max|err| fused vs xla: {err:.5f}")


if __name__ == "__main__":
    main()
