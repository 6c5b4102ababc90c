"""Fused multi-head attention (Pallas/TPU) for CLIP-scale sequences.

Why not plain XLA: for ViT-L/14 the [B, H, 257, 257] attention logits are
~540 MB/layer in bf16 at batch 256. XLA materializes them in HBM between the
QK matmul and the softmax, and again before the PV matmul — at ~800 GB/s that
is most of the attention wall time (measured: softmax alone = 26% of the
whole forward). CLIP sequences are tiny (257 vision / 77 text tokens), so a
flash-style BLOCKED kernel is overkill — instead each (batch, head) row fits
entirely in VMEM: one grid step = QK^T (MXU, f32 accum) -> masked softmax
(VPU, f32) -> PV (MXU), with logits never leaving VMEM.

Numerics match the reference path (f32 softmax, pre-scaled q) to bf16
round-off; parity is tested in tests/test_attention.py, including the causal
text-tower mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _attn_kernel(
    q_ref, k_ref, v_ref, o_ref, logits_ref, *, causal: bool, sm_scale: float, heads: int
):
    # blocks: q/k/v/o [1, S, H*Hd]; one batch row (all heads) per grid step,
    # so each DMA'd byte feeds H heads of MXU work instead of one. Per-head
    # QK^T matmuls land in one [H, S, S] f32 scratch so the softmax runs
    # ONCE over well-shaped [H, S, S] (15% faster than H separate [S, S]
    # softmaxes — VPU reductions like the taller operand).
    S = q_ref.shape[1]
    Hd = q_ref.shape[2] // heads
    for h in range(heads):  # static unroll; Mosaic pipelines the matmuls
        sl = slice(h * Hd, (h + 1) * Hd)
        logits_ref[h] = jax.lax.dot_general(
            q_ref[0, :, sl], k_ref[0, :, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [S, S] f32 — never leaves VMEM
    logits = logits_ref[:] * sm_scale
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
        logits = jnp.where((row >= col)[None], logits, NEG_INF)
    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v_ref.dtype)
    for h in range(heads):
        sl = slice(h * Hd, (h + 1) * Hd)
        o_ref[0, :, sl] = jax.lax.dot_general(
            p[h], v_ref[0, :, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "causal", "sm_scale", "interpret"))
def fused_attention_packed(
    q: jax.Array,  # [B, S, H*Hd] — projection output layout, no transpose
    k: jax.Array,
    v: jax.Array,
    heads: int,
    causal: bool = False,
    sm_scale: float = 1.0,
    interpret: bool = False,
) -> jax.Array:
    """softmax(q k^T * sm_scale [+ causal]) v per head, packed layout."""
    B, S, DH = q.shape
    spec = pl.BlockSpec((1, S, DH), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel, causal=causal, sm_scale=sm_scale, heads=heads),
        grid=(B,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        scratch_shapes=[pltpu.VMEM((heads, S, S), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((B, S, DH), q.dtype),
        # batch-grid steps are independent -> lets Mosaic pipeline them
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        interpret=interpret,
    )(q, k, v)


def fused_attention(
    q: jax.Array,  # [B, S, H, Hd]
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    sm_scale: float = 1.0,
    interpret: bool = False,
) -> jax.Array:
    """[B, S, H, Hd] convenience wrapper over fused_attention_packed."""
    B, S, H, Hd = q.shape
    pack = lambda x: x.reshape(B, S, H * Hd)
    out = fused_attention_packed(
        pack(q), pack(k), pack(v), heads=H, causal=causal, sm_scale=sm_scale,
        interpret=interpret,
    )
    return out.reshape(B, S, H, Hd)


# ---------------------------------------------------------------------------
# Fused backward kernel (round 3): the custom_vjp backward used to re-run
# attention through the XLA oracle and autodiff it — logits, probabilities,
# and the softmax-VJP temporaries all round-trip HBM ([B, H, S, S] f32 is
# ~270 MB at train batch 64), twice (oracle recompute + grad math). This
# kernel recomputes the probabilities IN VMEM per (batch row, head) and
# emits dq/dk/dv directly: five MXU matmuls + the softmax VJP per head,
# logits never leaving VMEM — the backward analogue of the forward kernel's
# design. Numerics: f32 logits/softmax/accumulation, bf16 matmul operands
# (same policy as forward); parity vs pure autodiff of the oracle is tested
# in interpret mode (tests/test_attention.py gradient tests now exercise
# THIS path). ISX_ATTN_FUSED_BWD=0 restores the XLA-oracle backward.
# ---------------------------------------------------------------------------


def _attn_bwd_kernel(
    q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, *,
    causal: bool, sm_scale: float, heads: int,
):
    S = q_ref.shape[1]
    Hd = q_ref.shape[2] // heads
    dtype = q_ref.dtype
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
        mask = row >= col
    for h in range(heads):
        sl = slice(h * Hd, (h + 1) * Hd)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        g = g_ref[0, :, sl]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        if causal:
            logits = jnp.where(mask, logits, NEG_INF)
        logits = logits - jnp.max(logits, axis=-1, keepdims=True)
        p32 = jnp.exp(logits)
        p32 = p32 / jnp.sum(p32, axis=-1, keepdims=True)  # [Sq, Sk] f32
        pb = p32.astype(dtype)
        # dv[kk, d] = sum_q p[q, kk] g[q, d]
        dv_ref[0, :, sl] = jax.lax.dot_general(
            pb, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dtype)
        # dp[q, kk] = g[q, :] . v[kk, :]
        dp = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        # softmax VJP: ds = p * (dp - sum_k dp*p), then the sm_scale chain
        ds = p32 * (dp - jnp.sum(dp * p32, axis=-1, keepdims=True))
        dsb = (ds * sm_scale).astype(dtype)
        dq_ref[0, :, sl] = jax.lax.dot_general(
            dsb, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dtype)
        # dk[kk, d] = sum_q ds[q, kk] q[q, d]
        dk_ref[0, :, sl] = jax.lax.dot_general(
            dsb, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dtype)


@functools.partial(
    jax.jit, static_argnames=("heads", "causal", "sm_scale", "interpret")
)
def fused_attention_bwd(
    q: jax.Array,  # [B, S, H*Hd] packed (same layout/scaling as the forward)
    k: jax.Array,
    v: jax.Array,
    g: jax.Array,  # cotangent of the attention output, [B, S, H*Hd]
    heads: int,
    causal: bool = False,
    sm_scale: float = 1.0,
    interpret: bool = False,
):
    """(dq, dk, dv) for softmax(q k^T * sm_scale [+ causal]) v, fused."""
    B, S, DH = q.shape
    spec = pl.BlockSpec((1, S, DH), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((B, S, DH), q.dtype)
    return pl.pallas_call(
        functools.partial(
            _attn_bwd_kernel, causal=causal, sm_scale=sm_scale, heads=heads
        ),
        grid=(B,),
        in_specs=[spec, spec, spec, spec],
        out_specs=[spec, spec, spec],
        out_shape=(out, out, out),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        interpret=interpret,
    )(q, k, v, g)


def _backward_packed(q, k, v, g, heads, causal, sm_scale, interpret):
    """Shared backward for every packed-layout attention core: the fused
    Pallas kernel on TPU (and in interpret-mode tests), the XLA oracle
    elsewhere or under ISX_ATTN_FUSED_BWD=0."""
    import os as _os

    use_fused = (interpret or jax.default_backend() == "tpu") and _os.environ.get(
        "ISX_ATTN_FUSED_BWD", "1"
    ) == "1"
    if use_fused:
        return fused_attention_bwd(
            q, k, v, g, heads=heads, causal=causal, sm_scale=sm_scale,
            interpret=interpret,
        )
    B, S, DH = q.shape
    Hd = DH // heads

    def ref(q_, k_, v_):
        return attention_reference(
            q_.reshape(B, S, heads, Hd),
            k_.reshape(B, S, heads, Hd),
            v_.reshape(B, S, heads, Hd),
            causal=causal,
            sm_scale=sm_scale,
        ).reshape(B, S, DH)

    _, vjp = jax.vjp(ref, q, k, v)
    return vjp(g)


# ---------------------------------------------------------------------------
# Differentiable wrapper: Pallas forward, fused-Pallas (or XLA-math) backward
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def attention_core(q, k, v, heads: int, causal: bool, sm_scale: float, interpret: bool):
    """Packed attention with a VJP, so the train step can differentiate
    through the fused kernel. Backward recomputes attention with the plain
    XLA oracle and autodiffs it — gradient memory/compute identical to the
    non-fused path; the kernel speed applies to the (far more frequent)
    inference forward."""
    return fused_attention_packed(
        q, k, v, heads=heads, causal=causal, sm_scale=sm_scale, interpret=interpret
    )


def _core_fwd(q, k, v, heads, causal, sm_scale, interpret):
    out = attention_core(q, k, v, heads, causal, sm_scale, interpret)
    return out, (q, k, v)


def _core_bwd(heads, causal, sm_scale, interpret, residuals, g):
    q, k, v = residuals
    return _backward_packed(q, k, v, g, heads, causal, sm_scale, interpret)


attention_core.defvjp(_core_fwd, _core_bwd)


# ---------------------------------------------------------------------------
# Packed-QKV input kernel: consumes the [B, S, 3D] output of the fused
# LN->qkv-proj matmul (ops/ln_matmul.py) directly, so q/k/v are never
# sliced apart in HBM (slicing [B,S,3D] into three [B,S,D] copies measured
# -11% e2e in round 1; in-VMEM slicing is what this kernel does instead).
# sm_scale is applied to the f32 logits in-kernel (slightly MORE accurate
# than pre-scaling bf16 q upstream).
#
# STATUS: measured NEGATIVE e2e (round 2) — the fused-block path built on
# this kernel reached 725 img/s vs 922 for the shipped composition, and the
# loss was traced to the upstream Pallas ln1->qkv matmul, not this kernel
# (benchmarks/block_fused_e2e.py; docs/PERF_NOTES.md "fused LN->matmul").
# Kept off the serving path; exercised by tests in interpret mode.
# ---------------------------------------------------------------------------


def _attn_kernel_packed(
    qkv_ref, o_ref, logits_ref, *, causal: bool, sm_scale: float, heads: int
):
    S = qkv_ref.shape[1]
    D = qkv_ref.shape[2] // 3
    Hd = D // heads
    for h in range(heads):
        sl = slice(h * Hd, (h + 1) * Hd)
        logits_ref[h] = jax.lax.dot_general(
            qkv_ref[0, :, sl],
            qkv_ref[0, :, D + h * Hd : D + (h + 1) * Hd],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    logits = logits_ref[:] * sm_scale
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
        logits = jnp.where((row >= col)[None], logits, NEG_INF)
    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(qkv_ref.dtype)
    for h in range(heads):
        o_ref[0, :, h * Hd : (h + 1) * Hd] = jax.lax.dot_general(
            p[h],
            qkv_ref[0, :, 2 * D + h * Hd : 2 * D + (h + 1) * Hd],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("heads", "causal", "sm_scale", "interpret")
)
def fused_attention_qkv_packed(
    qkv: jax.Array,  # [B, S, 3D], [q|k|v] column blocks (unscaled q)
    heads: int,
    causal: bool = False,
    sm_scale: float = 1.0,
    interpret: bool = False,
) -> jax.Array:
    B, S, D3 = qkv.shape
    D = D3 // 3
    in_spec = pl.BlockSpec((1, S, D3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, S, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _attn_kernel_packed, causal=causal, sm_scale=sm_scale, heads=heads
        ),
        grid=(B,),
        in_specs=[in_spec],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((heads, S, S), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((B, S, D), qkv.dtype),
        # the in-kernel sm_scale multiply keeps one extra [H, S, S] f32 temp
        # live vs the pre-scaled-q kernel above -> ~17 MB peak at ViT-L
        # shapes; raise the scoped-VMEM cap (v5e has 128 MB physical)
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",), vmem_limit_bytes=48 << 20
        ),
        interpret=interpret,
    )(qkv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def attention_qkv_packed_core(
    qkv, heads: int, causal: bool, sm_scale: float, interpret: bool
):
    """Packed-qkv attention with a VJP (XLA-oracle backward, like
    attention_core)."""
    return fused_attention_qkv_packed(
        qkv, heads=heads, causal=causal, sm_scale=sm_scale, interpret=interpret
    )


def _packed_fwd(qkv, heads, causal, sm_scale, interpret):
    out = attention_qkv_packed_core(qkv, heads, causal, sm_scale, interpret)
    return out, (qkv,)


def _packed_bwd(heads, causal, sm_scale, interpret, residuals, g):
    (qkv,) = residuals
    D = qkv.shape[-1] // 3
    dq, dk, dv = _backward_packed(
        qkv[..., :D], qkv[..., D : 2 * D], qkv[..., 2 * D :], g,
        heads, causal, sm_scale, interpret,
    )
    return (jnp.concatenate([dq, dk, dv], axis=-1),)


attention_qkv_packed_core.defvjp(_packed_fwd, _packed_bwd)


# ---------------------------------------------------------------------------
# QKV projection fused INTO the kernel
# ---------------------------------------------------------------------------


def _qkv_attn_kernel(
    x_ref,  # [1, S, D] block — one batch row
    w_ref,  # [D, 3D] full qkv weight, constant across the grid (VMEM-resident)
    b_ref,  # [1, 3D]
    o_ref,  # [1, S, D]
    qkv_ref,  # scratch [S, 3D]
    logits_ref,  # scratch [H, S, S] f32
    *,
    causal: bool,
    sm_scale: float,
    heads: int,
):
    S = x_ref.shape[1]
    D = x_ref.shape[2]
    Hd = D // heads
    group = logits_ref.shape[0]  # heads per softmax batch (VMEM-budgeted)
    x = x_ref[0]
    qkv_ref[:] = (
        jax.lax.dot_general(
            x, w_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(x.dtype)
        + b_ref[0]
    )
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
        causal_mask = (row >= col)[None]
    for g in range(0, heads, group):
        for i in range(group):
            h = g + i
            q = qkv_ref[:, h * Hd : (h + 1) * Hd]
            k = qkv_ref[:, D + h * Hd : D + (h + 1) * Hd]
            logits_ref[i] = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
        logits = logits_ref[:] * sm_scale
        if causal:
            logits = jnp.where(causal_mask, logits, NEG_INF)
        logits = logits - jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(x.dtype)
        for i in range(group):
            h = g + i
            v = qkv_ref[:, 2 * D + h * Hd : 2 * D + (h + 1) * Hd]
            o_ref[0, :, h * Hd : (h + 1) * Hd] = jax.lax.dot_general(
                p[i], v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("heads", "causal", "sm_scale", "interpret")
)
def fused_qkv_attention(
    x: jax.Array,  # [B, S, D] (already layer-normed)
    qkv_w: jax.Array,  # [D, 3D], [q|k|v] column blocks
    qkv_b: jax.Array,  # [3D]
    heads: int,
    causal: bool = False,
    sm_scale: float = 1.0,
    interpret: bool = False,
) -> jax.Array:
    """QKV projection + attention in one kernel -> [B, S, D].

    q, k, v never exist in HBM: the projection result lives in a [S, 3D]
    VMEM scratch per batch row and the qkv weight block is resident across
    the whole grid (constant index_map). Saves ~6 HBM traversals of the
    [B, S, D] activation per layer vs projecting in XLA and re-reading in
    the attention kernel — the attention path is bandwidth-bound, not
    FLOP-bound (docs/PERF_NOTES.md).
    """
    B, S, D = x.shape
    # logits scratch budget ~3 MB after Mosaic padding (sublanes 8, lanes
    # 128): pick the largest head group that fits
    s_sub = -(-S // 8) * 8
    s_lane = -(-S // 128) * 128
    group = heads
    while group > 1 and group * s_sub * s_lane * 4 > 3 * 1024 * 1024:
        group //= 2
    while heads % group:
        group -= 1
    xspec = pl.BlockSpec((1, S, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((D, 3 * D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, 3 * D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _qkv_attn_kernel, causal=causal, sm_scale=sm_scale, heads=heads
        ),
        grid=(B,),
        in_specs=[xspec, wspec, bspec],
        out_specs=xspec,
        scratch_shapes=[
            pltpu.VMEM((S, 3 * D), x.dtype),
            pltpu.VMEM((group, S, S), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((B, S, D), x.dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        interpret=interpret,
    )(x, qkv_w, qkv_b.reshape(1, -1))


# ---------------------------------------------------------------------------
# Split-key kernel: dodge the S=257 -> 384 lane padding
#
# The shipped kernel's [S, S] logits pad 257 lanes up to 384 on EVERY QK and
# PV matmul (1.49x wasted MXU work; the variant ladder pinned the core at
# 37 TFLOP/s vs a ~98 ceiling, docs/PERF_NOTES.md round 2). Here keys/values
# are padded once to 264 in HBM and split in-kernel into an ALIGNED 256-key
# main block plus an 8-wide tail (1 real key + 7 masked): the MXU then works
# on [S, 256] + [S, 8] tiles — 264 effective lanes instead of 384 — with an
# exact two-block softmax (shared max/denominator, no online iteration
# needed since both blocks sit in VMEM).
# ---------------------------------------------------------------------------

_TAIL = 8  # sublane quantum; smallest tail block Mosaic accepts


def _attn_kernel_split(
    q_ref, k_ref, v_ref, o_ref, lm_ref, lt_ref, *, sm_scale: float, heads: int,
    s_main: int, s_real: int,
):
    Sp = q_ref.shape[1]  # padded sequence (s_main + _TAIL)
    Hd = q_ref.shape[2] // heads
    for h in range(heads):
        sl = slice(h * Hd, (h + 1) * Hd)
        lm_ref[h] = jax.lax.dot_general(
            q_ref[0, :, sl], k_ref[0, :s_main, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Sp, s_main] — fully lane-aligned
        lt_ref[h] = jax.lax.dot_general(
            q_ref[0, :, sl], k_ref[0, s_main:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Sp, _TAIL]
    lm = lm_ref[:] * sm_scale
    lt = lt_ref[:] * sm_scale
    # mask the fake tail keys (indices s_real..Sp-1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, _TAIL), 2)
    lt = jnp.where(col < (s_real - s_main), lt, NEG_INF)
    m = jnp.maximum(
        jnp.max(lm, axis=-1, keepdims=True), jnp.max(lt, axis=-1, keepdims=True)
    )
    pm = jnp.exp(lm - m)
    pt = jnp.exp(lt - m)
    denom = jnp.sum(pm, axis=-1, keepdims=True) + jnp.sum(pt, axis=-1, keepdims=True)
    pm = (pm / denom).astype(v_ref.dtype)
    pt = (pt / denom).astype(v_ref.dtype)
    for h in range(heads):
        sl = slice(h * Hd, (h + 1) * Hd)
        o_ref[0, :, sl] = (
            jax.lax.dot_general(
                pm[h], v_ref[0, :s_main, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + jax.lax.dot_general(
                pt[h], v_ref[0, s_main:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "sm_scale", "interpret"))
def fused_attention_split(
    q: jax.Array,  # [B, S, H*Hd] packed, S misaligned (e.g. 257)
    k: jax.Array,
    v: jax.Array,
    heads: int,
    sm_scale: float = 1.0,
    interpret: bool = False,
) -> jax.Array:
    """Split-key attention for lane-misaligned S (vision tower's 257).

    Non-causal only (the vision tower; the causal text tower's S=77 is a
    different alignment regime). Pads q/k/v to s_main+8 rows in HBM (an
    XLA pad the compiler fuses into the producing matmul's epilogue) and
    slices the output back to S."""
    B, S, DH = q.shape
    s_main = (S // 128) * 128
    assert 0 < s_main < S <= s_main + _TAIL, (
        f"S={S} not in the split kernel's regime (need s_main < S <= s_main+{_TAIL})"
    )
    Sp = s_main + _TAIL
    pad = [(0, 0), (0, Sp - S), (0, 0)]
    qp, kp, vp = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    spec = pl.BlockSpec((1, Sp, DH), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _attn_kernel_split, sm_scale=sm_scale, heads=heads,
            s_main=s_main, s_real=S,
        ),
        grid=(B,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        scratch_shapes=[
            pltpu.VMEM((heads, Sp, s_main), jnp.float32),
            pltpu.VMEM((heads, Sp, _TAIL), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((B, Sp, DH), q.dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :S]


@functools.partial(
    jax.jit, static_argnames=("heads", "s_real", "sm_scale", "interpret")
)
def fused_attention_split_padded(
    qp: jax.Array,  # [B, Sp, H*Hd], Sp = s_main + 8, rows >= s_real zeroed
    kp: jax.Array,
    vp: jax.Array,
    heads: int,
    s_real: int,
    sm_scale: float = 1.0,
    interpret: bool = False,
) -> jax.Array:
    """Split-key kernel on ALREADY-padded operands (no per-call HBM pad/
    slice) — for pipelines that keep S padded end-to-end. Output rows
    >= s_real are garbage and must be masked/ignored by the caller."""
    B, Sp, DH = qp.shape
    s_main = Sp - _TAIL
    spec = pl.BlockSpec((1, Sp, DH), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _attn_kernel_split, sm_scale=sm_scale, heads=heads,
            s_main=s_main, s_real=s_real,
        ),
        grid=(B,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        scratch_shapes=[
            pltpu.VMEM((heads, Sp, s_main), jnp.float32),
            pltpu.VMEM((heads, Sp, _TAIL), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((B, Sp, DH), qp.dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        interpret=interpret,
    )(qp, kp, vp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def attention_split_core(q, k, v, heads: int, sm_scale: float, interpret: bool):
    """Split-key attention with a VJP (XLA-oracle backward, like
    attention_core). Non-causal only."""
    return fused_attention_split(
        q, k, v, heads=heads, sm_scale=sm_scale, interpret=interpret
    )


def _split_fwd(q, k, v, heads, sm_scale, interpret):
    out = attention_split_core(q, k, v, heads, sm_scale, interpret)
    return out, (q, k, v)


def _split_bwd(heads, sm_scale, interpret, residuals, g):
    q, k, v = residuals
    return _backward_packed(q, k, v, g, heads, False, sm_scale, interpret)


attention_split_core.defvjp(_split_fwd, _split_bwd)


# ---------------------------------------------------------------------------
# Grouped / software-pipelined kernel (round-3 attention campaign)
#
# The shipped kernel runs ONE softmax over the full [H, S, S] logits scratch:
# all H QK matmuls, then the VPU softmax, then all H PV matmuls — the MXU
# idles through the softmax. This variant processes heads in groups of G
# with TWO [G, S, S] scratch buffers: group g+1's QK matmuls are issued
# BETWEEN softmax(g) and PV(g), so Mosaic can overlap the VPU softmax with
# independent MXU work (classic double-buffered software pipelining).
# `bf16_softmax` additionally runs exp/normalize in bf16 after the f32
# max-subtract, halving softmax VPU+VMEM bytes (normalization stays exact:
# the reciprocal-denominator multiply is applied to the f32 PV accumulator).
#
# STATUS (real-v5e, benchmarks/attn_pipeline_bench.py, 2026-08-18):
#   group=4 pipelined: 1.0881 ms/layer vs 1.1526 base — the best measured
#   attention core, numerics identical to base; enabled via ISX_ATTN_PIPE=4.
#   bf16_softmax: 1.1871 ms/layer — measured NEGATIVE (the VPU is not the
#   wall once pipelining hides it behind MXU work); kept tested, default off.
#   The MXU-only floor (softmax deleted) is 1.0116 ms/layer / 42.8 TFLOP/s:
#   the core is issue-bound on K=N=64 half-filled-MXU matmuls, so no softmax
#   optimization can recover more than ~12% — docs/PERF_NOTES.md round-3
#   campaign table.
# ---------------------------------------------------------------------------


def _attn_kernel_grouped(
    q_ref, k_ref, v_ref, o_ref, s0_ref, s1_ref, *,
    causal: bool, sm_scale: float, heads: int, group: int, bf16_softmax: bool,
):
    S = q_ref.shape[1]
    Hd = q_ref.shape[2] // heads
    n_groups = heads // group
    scratch = [s0_ref, s1_ref]
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
        causal_mask = (row >= col)[None]

    def qk_into(dst, g):
        for i in range(group):
            sl = slice((g * group + i) * Hd, (g * group + i + 1) * Hd)
            dst[i] = jax.lax.dot_general(
                q_ref[0, :, sl], k_ref[0, :, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    def pv_from(logits, g):
        logits = logits * sm_scale
        if causal:
            logits = jnp.where(causal_mask, logits, NEG_INF)
        logits = logits - jnp.max(logits, axis=-1, keepdims=True)
        if bf16_softmax:
            p16 = jnp.exp(logits.astype(jnp.bfloat16))
            recip = 1.0 / jnp.sum(p16.astype(jnp.float32), axis=-1, keepdims=True)
            p = p16.astype(v_ref.dtype)
        else:
            p32 = jnp.exp(logits)
            recip = 1.0 / jnp.sum(p32, axis=-1, keepdims=True)
            p = p32.astype(v_ref.dtype)
        for i in range(group):
            sl = slice((g * group + i) * Hd, (g * group + i + 1) * Hd)
            acc = jax.lax.dot_general(
                p[i], v_ref[0, :, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0, :, sl] = (acc * recip[i]).astype(o_ref.dtype)

    qk_into(scratch[0], 0)
    for g in range(n_groups):
        if g + 1 < n_groups:
            # softmax(g) does not depend on QK(g+1): issuing it here gives
            # Mosaic independent MXU work to overlap with the VPU softmax
            qk_into(scratch[(g + 1) % 2], g + 1)
        pv_from(scratch[g % 2][:], g)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "group", "causal", "sm_scale", "bf16_softmax", "interpret"),
)
def fused_attention_grouped(
    q: jax.Array,  # [B, S, H*Hd] packed layout
    k: jax.Array,
    v: jax.Array,
    heads: int,
    group: int,
    causal: bool = False,
    sm_scale: float = 1.0,
    bf16_softmax: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Grouped double-buffered attention; heads % group must be 0."""
    assert heads % group == 0, f"heads={heads} not divisible by group={group}"
    B, S, DH = q.shape
    spec = pl.BlockSpec((1, S, DH), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _attn_kernel_grouped, causal=causal, sm_scale=sm_scale,
            heads=heads, group=group, bf16_softmax=bf16_softmax,
        ),
        grid=(B,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        scratch_shapes=[
            pltpu.VMEM((group, S, S), jnp.float32),
            pltpu.VMEM((group, S, S), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((B, S, DH), q.dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",), vmem_limit_bytes=64 << 20
        ),
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def attention_grouped_core(
    q, k, v, heads: int, group: int, causal: bool, sm_scale: float,
    bf16_softmax: bool, interpret: bool,
):
    """Grouped attention with a VJP (XLA-oracle backward, like
    attention_core)."""
    return fused_attention_grouped(
        q, k, v, heads=heads, group=group, causal=causal, sm_scale=sm_scale,
        bf16_softmax=bf16_softmax, interpret=interpret,
    )


def _grouped_fwd(q, k, v, heads, group, causal, sm_scale, bf16_softmax, interpret):
    out = attention_grouped_core(
        q, k, v, heads, group, causal, sm_scale, bf16_softmax, interpret
    )
    return out, (q, k, v)


def _grouped_bwd(heads, group, causal, sm_scale, bf16_softmax, interpret, residuals, g):
    q, k, v = residuals
    # the bf16-softmax forward is a documented approximation; its gradient
    # (like the old oracle backward) is taken through exact-f32 softmax math
    return _backward_packed(q, k, v, g, heads, causal, sm_scale, interpret)


attention_grouped_core.defvjp(_grouped_fwd, _grouped_bwd)


def split_regime(S: int) -> bool:
    """True when the split-key kernel applies (lane-misaligned S with a
    non-empty aligned main block, e.g. the vision tower's 257)."""
    s_main = (S // 128) * 128
    return 0 < s_main < S <= s_main + _TAIL


def attention_reference(q, k, v, causal=False, sm_scale=1.0):
    """Plain-XLA oracle with identical semantics (tests + non-TPU fallback)."""
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * sm_scale
    if causal:
        S = q.shape[1]
        mask = jnp.tril(jnp.ones((S, S), dtype=bool))
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)
