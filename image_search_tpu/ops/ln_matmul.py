"""Fused LayerNorm -> matmul (Pallas/TPU).

Why: in the transformer block, each LayerNorm is a standalone XLA kernel —
a pure HBM-bandwidth pass (read [B,S,D] + write [B,S,D], ~0.22 ms/LN at
ViT-L/14 batch 160; 48 of them = 11 ms of the 174 ms forward, measured in
benchmarks/fwd_ladder.py). The LN output is consumed exactly once, by the
matmul that follows (qkv projection after ln1, MLP fc after ln2). Fusing the
LN into the matmul's prologue eliminates the round-trip: the kernel reads the
raw residual-stream block, normalizes it in VMEM (f32 stats, same numerics
as models.clip._layer_norm), and feeds the MXU directly.

Replaces the LN+projection sequence the reference runs as separate Burn ops
(``/root/reference/clip/build.rs:75-78`` codegen); there is no reference
counterpart kernel — this is TPU-first fusion.

Shape contract: x [M, K] (rows = flattened batch*seq), w [K, N]; LN is over
K (the contraction dim), so one M-block sees the full feature axis. The M
grid handles non-divisible M by masking (Pallas pads the tail block; padded
rows normalize garbage that is never written back).

STATUS: measured NEGATIVE e2e (round 2, real v5e) — standalone the kernel
exactly ties XLA's LN-then-matmul (106/117 TFLOP/s at ViT-L qkv/fc shapes,
benchmarks/ln_matmul_probe.py), but inside the model every composition that
uses it LOSES: full fused block 725 img/s, ln1->qkv only 720, ln2->fc only
884, vs 922 for the shipped path (benchmarks/block_fused_e2e.py). XLA
overlaps the standalone LN with neighboring ops and pipelines matmuls
across block boundaries; the monolithic Pallas call forfeits that. Details
in docs/PERF_NOTES.md ("fused LN->matmul"). Kept off the serving path;
exercised by tests in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_mm_kernel(x_ref, ls_ref, lb_ref, w_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)  # [bm, K]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    cent = x - mean
    var = jnp.mean(cent * cent, axis=-1, keepdims=True)  # two-pass, == jnp.var
    y = cent * jax.lax.rsqrt(var + eps)
    y = y * ls_ref[0].astype(jnp.float32) + lb_ref[0].astype(jnp.float32)
    acc = jax.lax.dot_general(
        y.astype(w_ref.dtype),
        w_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # bias added in the output dtype, matching `einsum(...) + b` in bf16
    o_ref[...] = acc.astype(o_ref.dtype) + b_ref[0]


@functools.partial(
    jax.jit, static_argnames=("eps", "block_m", "interpret")
)
def ln_matmul(
    x: jax.Array,  # [M, K] residual-stream rows (pre-LN)
    ln_scale: jax.Array,  # [K]
    ln_bias: jax.Array,  # [K]
    w: jax.Array,  # [K, N]
    b: jax.Array,  # [N]
    eps: float = 1e-5,
    block_m: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """LayerNorm(x) @ w + b with the LN fused into the matmul prologue."""
    M, K = x.shape
    N = w.shape[1]
    dtype = x.dtype
    grid = (pl.cdiv(M, block_m),)
    return pl.pallas_call(
        functools.partial(_ln_mm_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_m, N), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((M, N), dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )(
        x,
        # LN affine params stay f32 in-kernel (matches models.clip._layer_norm)
        ln_scale.reshape(1, K).astype(jnp.float32),
        ln_bias.reshape(1, K).astype(jnp.float32),
        w,
        b.reshape(1, N).astype(dtype),
    )


def pick_block_m(K: int, N: int, itemsize: int = 2, budget: int = 14 << 20) -> int:
    """Largest power-of-two M block whose double-buffered in/out blocks plus
    the resident [K, N] weight fit the ~16 MB scoped-VMEM compiler budget."""
    for bm in (512, 256, 128, 64):
        need = 2 * bm * K * itemsize + 2 * bm * N * itemsize + K * N * itemsize
        if need <= budget:
            return bm
    return 32


# ---------------------------------------------------------------------------
# Differentiable wrapper: Pallas forward, XLA-math backward (same pattern as
# ops.attention.attention_core — the kernel speed applies to the far more
# frequent inference forward; gradients recompute with the plain-XLA oracle)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def ln_matmul_core(x, ln_scale, ln_bias, w, b, eps: float, block_m: int, interpret: bool):
    return ln_matmul(x, ln_scale, ln_bias, w, b, eps=eps, block_m=block_m, interpret=interpret)


def _core_fwd(x, ln_scale, ln_bias, w, b, eps, block_m, interpret):
    out = ln_matmul_core(x, ln_scale, ln_bias, w, b, eps, block_m, interpret)
    return out, (x, ln_scale, ln_bias, w, b)


def _core_bwd(eps, block_m, interpret, residuals, g):
    x, ln_scale, ln_bias, w, b = residuals
    _, vjp = jax.vjp(lambda *a: ln_matmul_reference(*a, eps=eps), x, ln_scale, ln_bias, w, b)
    return vjp(g)


ln_matmul_core.defvjp(_core_fwd, _core_bwd)


def ln_matmul_reference(x, ln_scale, ln_bias, w, b, eps: float = 1e-5):
    """Plain-XLA oracle with identical semantics (tests + non-TPU fallback)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    y = y.astype(x.dtype)
    return jnp.dot(y, w.astype(x.dtype)) + b.astype(x.dtype)
