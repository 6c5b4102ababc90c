"""Final attention-core campaign: find or close the last ~6 ms (real TPU).

Round-3 state: four structural attempts (K-split, rows-per-step, split-key,
fused-qkv) all measured NEGATIVE; every softmax micro-variant in
attn_variants.py lands within noise at ~37 TFLOP/s against the ~98 ceiling
set by the K=64 (QK) / N=64 (PV) half-filled-MXU shapes. Two hypotheses
remain, both answered here by measurement:

  nosm   : matmuls only, softmax deleted. The MXU-ONLY floor for this
           shape family. If this also sits near 37 TFLOP/s, the core is
           issue-bound on small matmuls and NO softmax trick can help —
           frontier closes with data.
  pipeG  : manual software pipeline, head-group size G with double-
           buffered [G,S,S] logits scratch: QK(g+1) is issued BETWEEN
           softmax(g) and PV(g), giving Mosaic independent MXU work to
           overlap with the VPU softmax. If VPU/MXU serialization is the
           gap, this recovers it.
  bf16sm : softmax exp/normalize in bf16 after f32 max-subtract — halves
           VPU+VMEM bytes in the softmax passes; numerics reported.

Chained-24-layer protocol (output feeds next q) per attn_variants.py so
the ~2.5 ms/dispatch tunnel overhead amortizes; incremental JSON so a
wedged tunnel mid-run loses nothing. ONE process, serialized (CLAUDE.md).

Run: python benchmarks/attn_pipeline_bench.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

NEG_INF = float(np.finfo(np.float32).min)
# ISX_INTERP=1: run tiny shapes in pallas interpret mode on CPU — correctness
# gate before spending a TPU session (no timing validity — written to a
# separate .interp.json so CPU numbers can never be misread as TPU ones)
INTERPRET = os.environ.get("ISX_INTERP") == "1"
OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "attn_pipeline_bench.interp.json" if INTERPRET else "attn_pipeline_bench.json",
)


def make_variant(variant: str, group: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(q_ref, k_ref, v_ref, o_ref, s0_ref, s1_ref, *, heads: int):
        S = q_ref.shape[1]
        Hd = q_ref.shape[2] // heads
        n_groups = heads // group
        scratch = [s0_ref, s1_ref]

        def qk_into(dst, g):
            for i in range(group):
                sl = slice((g * group + i) * Hd, (g * group + i + 1) * Hd)
                dst[i] = jax.lax.dot_general(
                    q_ref[0, :, sl], k_ref[0, :, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

        def pv_from(logits, g):
            if variant == "nosm":
                p = logits.astype(v_ref.dtype)
                recip = None
            elif variant == "bf16sm":
                logits = logits - jnp.max(logits, axis=-1, keepdims=True)
                p16 = jnp.exp(logits.astype(jnp.bfloat16))  # bf16 transcendental
                recip = 1.0 / jnp.sum(p16.astype(jnp.float32), axis=-1, keepdims=True)
                p = p16.astype(v_ref.dtype)
            else:
                logits = logits - jnp.max(logits, axis=-1, keepdims=True)
                p32 = jnp.exp(logits)
                recip = 1.0 / jnp.sum(p32, axis=-1, keepdims=True)
                p = p32.astype(v_ref.dtype)
            for i in range(group):
                sl = slice((g * group + i) * Hd, (g * group + i + 1) * Hd)
                acc = jax.lax.dot_general(
                    p[i], v_ref[0, :, sl], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if recip is not None:
                    acc = acc * recip[i]
                o_ref[0, :, sl] = acc.astype(o_ref.dtype)

        if variant.startswith("pipe"):
            qk_into(scratch[0], 0)
            for g in range(n_groups):
                cur = scratch[g % 2]
                # issue the NEXT group's QK before consuming this group's
                # logits: softmax(cur) has no dependence on it, so Mosaic
                # may overlap the VPU softmax with MXU work
                if g + 1 < n_groups:
                    qk_into(scratch[(g + 1) % 2], g + 1)
                pv_from(cur[:], g)
        else:  # base / nosm / bf16sm: sequential per group
            for g in range(n_groups):
                qk_into(scratch[0], g)
                pv_from(scratch[0][:], g)

    @functools.partial(jax.jit, static_argnames=("heads",))
    def attn(q, k, v, heads):
        B, S, DH = q.shape
        spec = pl.BlockSpec((1, S, DH), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(kernel, heads=heads),
            grid=(B,),
            in_specs=[spec, spec, spec],
            out_specs=spec,
            scratch_shapes=[
                pltpu.VMEM((group, S, S), jnp.float32),
                pltpu.VMEM((group, S, S), jnp.float32),
            ],
            out_shape=jax.ShapeDtypeStruct((B, S, DH), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",), vmem_limit_bytes=64 << 20
            ),
            interpret=INTERPRET,
        )(q, k, v)

    return attn


def main() -> None:
    import jax
    import jax.numpy as jnp

    if INTERPRET:
        jax.config.update("jax_platforms", "cpu")
        B, S, D, H, L = 2, 257, 1024, 16, 2
    else:
        assert jax.default_backend() == "tpu"
        probe = jnp.ones((8, 8), jnp.bfloat16)
        float((probe @ probe)[0, 0])  # tiny-matmul tunnel probe before heavy work
        B, S, D, H, L = 160, 257, 1024, 16, 24
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, S, D)) * 0.125, jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, S, D)), jnp.bfloat16)

    def sync(x):
        return float(jnp.sum(x.ravel()[:1]))

    results = {}
    oracle_out = None
    plans = [
        ("base16", 16),  # shipped-kernel shape: ONE softmax over [16,S,S]
        ("base", 8),
        ("nosm", 8),
        ("pipe1", 1),
        ("pipe2", 2),
        ("pipe4", 4),
        ("pipe8", 8),
        ("bf16sm", 8),
    ]
    for name, group in plans:
        attn = make_variant(name, group)

        @jax.jit
        def run24(q, k, v, attn=attn):
            out = q
            for _ in range(L):
                out = attn(out, k, v, H)
            return out

        try:
            for _ in range(3):
                sync(run24(q, k, v))
        except Exception as e:
            results[name] = f"FAILED: {str(e).splitlines()[0][:120]}"
            print(f"{name:7s}: {results[name]}")
            with open(OUT, "w") as f:
                json.dump(results, f, indent=1)
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
        per_layer = dt / L * 1e3
        flops = 4 * B * H * S * S * (D // H) * L
        results[name] = {
            "ms_per_layer": round(per_layer, 4),
            "tflops": round(flops / dt / 1e12, 2),
        }
        if name != "nosm":
            one = attn(q, k, v, H)
            if oracle_out is None:
                from image_search_tpu.ops.attention import attention_reference

                Hd = D // H
                oracle_out = attention_reference(
                    q.astype(jnp.float32).reshape(B, S, H, Hd),
                    k.astype(jnp.float32).reshape(B, S, H, Hd),
                    v.astype(jnp.float32).reshape(B, S, H, Hd),
                ).reshape(B, S, D)
            err = float(jnp.max(jnp.abs(one.astype(jnp.float32) - oracle_out)))
            results[name]["max_err"] = round(err, 6)
        print(f"{name:7s}: {json.dumps(results[name])}")
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
