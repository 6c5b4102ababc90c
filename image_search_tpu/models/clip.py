"""CLIP dual-tower model in pure functional JAX.

This replaces BOTH embedding engines of the reference with one implementation
and one checkpoint:

- the Burn-codegen'd vision tower (``/root/reference/clip/build.rs:75-78``,
  loaded per scan at ``server/src/clip.rs:47-48``), and
- the embed_anything/candle CPU text tower (``server/src/clip.rs:35-40``).

Design notes (TPU-first, not a translation):

- **Functional**: parameters are a plain pytree of ``jnp`` arrays; every
  entry point is jittable and shardable with ``jax.sharding`` annotations.
- **Stacked layers + ``lax.scan``**: all transformer blocks of a tower are
  stored stacked along a leading ``[L, ...]`` axis and iterated with
  ``lax.scan``. One layer is traced/compiled once regardless of depth — fast
  compiles, identical math.
- **Dtype policy**: activations run in ``compute_dtype`` (bf16 on TPU for the
  MXU); layernorm statistics and softmax run in f32 for numerical parity with
  the HF reference (``openai/clip-vit-large-patch14``).
- **Patch conv as matmul**: the 14x14/stride-14 patchify conv is a reshape +
  one big ``[B*256, 588] @ [588, 1024]`` matmul — the exact op the MXU wants.

Numerical parity target: HuggingFace ``transformers.CLIPModel`` (cosine
>= 0.999, BASELINE.md); verified in ``tests/test_model_parity.py``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from image_search_tpu.config import CLIPConfig, TowerConfig

Params = Dict[str, Any]

NEG_INF = float(jnp.finfo(jnp.float32).min)


# ---------------------------------------------------------------------------
# Primitive pieces
# ---------------------------------------------------------------------------


def _layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float) -> jax.Array:
    """LayerNorm with f32 statistics, output cast back to x.dtype."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(dtype)


def _act(x: jax.Array, kind: str) -> jax.Array:
    if kind == "quick_gelu":
        # HF CLIP's QuickGELUActivation: x * sigmoid(1.702 * x)
        return x * jax.nn.sigmoid(1.702 * x)
    if kind == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if kind == "gelu_tanh":
        return jax.nn.gelu(x, approximate=True)
    raise ValueError(f"unknown activation {kind!r}")


def _use_fused_attention() -> bool:
    """Pallas fused attention on TPU; plain-XLA math elsewhere (identical
    semantics, see ops/attention.py)."""
    return jax.default_backend() == "tpu"


def _attention(
    x: jax.Array,
    blk: Params,
    cfg: TowerConfig,
    causal: bool,
    s_real: int | None = None,
) -> jax.Array:
    """Multi-head self-attention, HF CLIPAttention numerics.

    q is pre-scaled by head_dim**-0.5; logits+softmax in f32. On TPU the
    QK^T -> softmax -> PV core runs as one Pallas kernel so the [S, S]
    logits never round-trip HBM (26% of forward time at ViT-L/14 batch 256).

    s_real: set when the sequence is zero-padded end-to-end to an aligned
    Sp (ISX_VIT_SPAD, see encode_image) — rows >= s_real are padding.
    Keys/values at those rows are masked BY INDEX (their projected values
    are bias garbage, not zero); output rows >= s_real are garbage the
    caller never reads. Non-causal only.
    """
    B, S, D = x.shape
    H, Hd = cfg.num_heads, cfg.head_dim
    dtype = x.dtype

    # Params store q|k|v fused ([D, 3D], one checkpoint tensor), but the
    # projections run as three weight-sliced matmuls: splitting the fused
    # activation instead costs three [B, S, D] HBM copies (measured -11%
    # e2e), and projecting inside the attention kernel is a wash — its
    # per-row 257-high matmuls waste what the saved traffic gains
    # (docs/PERF_NOTES.md).
    w = blk["qkv_w"].astype(dtype)
    b = blk["qkv_b"].astype(dtype)

    def proj(lo):
        return (
            jnp.einsum("bsd,de->bse", x, w[:, lo : lo + D]) + b[lo : lo + D]
        )

    # NB: Python float stays weakly typed (an np.float32 scalar would
    # promote bf16 activations to f32, doubling attention bandwidth)
    q = proj(0) * float(Hd**-0.5)
    k = proj(D)
    v = proj(2 * D)

    if _use_fused_attention():
        from image_search_tpu.ops.attention import attention_core

        # ISX_ATTN_SPLIT=1: route lane-misaligned non-causal attention
        # (the vision tower's S=257) through the split-key kernel — the
        # round-3 e2e A/B candidate (benchmarks/attn_split_bench.py)
        import os as _os

        from image_search_tpu.ops.attention import attention_split_core, split_regime

        # ISX_ATTN_PIPE=<G>: grouped double-buffered kernel (heads in groups
        # of G, next group's QK overlapped with this group's softmax);
        # ISX_ATTN_BF16SM=1 additionally runs softmax exp in bf16. G=4 is
        # the DEFAULT: measured 1.0881 vs 1.1526 ms/layer standalone and
        # 938.6 vs 930.0 img/s e2e (benchmarks/attn_pipeline_bench.py +
        # bench.py A/B, 2026-08-18), numerics identical to the stacked
        # kernel. ISX_ATTN_PIPE=0 restores the single-softmax kernel.
        pipe_group = int(_os.environ.get("ISX_ATTN_PIPE", "4") or 0)

        if s_real is not None and not causal:
            # end-to-end padded sequence (ISX_VIT_SPAD): operands are
            # already at the aligned Sp, so the split-key kernel runs with
            # no per-call HBM pad/slice — the round-3 A/B's main overhead
            from image_search_tpu.ops.attention import (
                fused_attention_split_padded,
            )

            out = fused_attention_split_padded(q, k, v, H, s_real, 1.0, False)
        elif (
            not causal
            and _os.environ.get("ISX_ATTN_SPLIT") == "1"
            and split_regime(S)
        ):
            out = attention_split_core(q, k, v, H, 1.0, False)
        elif pipe_group > 0 and H % pipe_group == 0:
            from image_search_tpu.ops.attention import attention_grouped_core

            out = attention_grouped_core(
                q, k, v, H, pipe_group, causal, 1.0,
                _os.environ.get("ISX_ATTN_BF16SM") == "1", False,
            )
        else:
            out = attention_core(q, k, v, H, causal, 1.0, False)
    else:
        from image_search_tpu.ops.attention import attention_reference

        if s_real is not None and not causal:
            # CPU semantics of the padded path: attention over the real
            # rows, zeros in the pad rows (the kernel leaves garbage there;
            # both are never read — zeros make CPU parity checks exact)
            out = attention_reference(
                q[:, :s_real].reshape(B, s_real, H, Hd),
                k[:, :s_real].reshape(B, s_real, H, Hd),
                v[:, :s_real].reshape(B, s_real, H, Hd),
                causal=False,
            ).reshape(B, s_real, D)
            out = jnp.pad(out, ((0, 0), (0, S - s_real), (0, 0)))
        else:
            out = attention_reference(
                q.reshape(B, S, H, Hd),
                k.reshape(B, S, H, Hd),
                v.reshape(B, S, H, Hd),
                causal=causal,
            ).reshape(B, S, D)
    return jnp.einsum("bsd,de->bse", out, blk["o_w"].astype(dtype)) + blk["o_b"].astype(dtype)


def _mlp(x: jax.Array, blk: Params, cfg: TowerConfig) -> jax.Array:
    dtype = x.dtype
    h = jnp.einsum("bsd,dm->bsm", x, blk["fc_w"].astype(dtype)) + blk["fc_b"].astype(dtype)
    h = _act(h, cfg.act)
    return jnp.einsum("bsm,md->bsd", h, blk["proj_w"].astype(dtype)) + blk["proj_b"].astype(dtype)


def _block(x: jax.Array, blk: Params, cfg: TowerConfig, causal: bool,
           s_real: int | None = None) -> jax.Array:
    """Pre-LN transformer block (HF CLIPEncoderLayer)."""
    x = x + _attention(_layer_norm(x, blk["ln1_scale"], blk["ln1_bias"], cfg.layernorm_eps), blk, cfg, causal, s_real)
    x = x + _mlp(_layer_norm(x, blk["ln2_scale"], blk["ln2_bias"], cfg.layernorm_eps), blk, cfg)
    return x


def _attention_cls(xn: jax.Array, blk: Params, cfg: TowerConfig,
                   s_real: int | None = None) -> jax.Array:
    """Attention output for the CLS row only (non-causal).

    Same math as ``_attention`` restricted to query row 0: K/V are still
    projected for every position (the CLS row attends to all of them), but
    the Q projection, the logits, the softmax, and the PV contraction
    shrink to one row. TPU-shaped on purpose: a naive per-(batch, head)
    formulation lowers to B*H tiny [1, Hd] @ [Hd, S] matvecs (measured: it
    ate most of the removed-FLOP win). Instead the per-head logits come
    from ONE batched matmul against a block-diagonal [D, H] right-hand side
    (full K=D MXU contraction depth), and the PV step is a broadcasted
    multiply-reduce over S (bandwidth-bound, two [B, S, D] reads).

    Dtype sequence mirrors the Pallas kernel: f32 logits (MXU
    accumulation), f32 softmax, probabilities cast to the activation
    dtype, f32 PV accumulation.

    s_real: under ISX_VIT_SPAD the input carries pad rows — slice them
    off up front (cheaper than masking here: only the CLS row survives,
    and slicing keeps the reductions identical to the unpadded path).
    """
    if s_real is not None:
        xn = xn[:, :s_real]
    B, S, D = xn.shape
    H, Hd = cfg.num_heads, cfg.head_dim
    dtype = xn.dtype
    w = blk["qkv_w"].astype(dtype)
    b = blk["qkv_b"].astype(dtype)
    q = (jnp.einsum("bd,de->be", xn[:, 0], w[:, :D]) + b[:D]) * float(Hd**-0.5)
    k = jnp.einsum("bsd,de->bse", xn, w[:, D : 2 * D]) + b[D : 2 * D]
    v = jnp.einsum("bsd,de->bse", xn, w[:, 2 * D :]) + b[2 * D :]

    # logits[b, s, h] = q[b, h*Hd:(h+1)*Hd] . k[b, s, h*Hd:(h+1)*Hd]:
    # place q block-diagonally in a [B, D, H] operand so the head-blocked
    # dot is a single k @ q_blk batched matmul instead of H matvecs.
    head_of = jnp.arange(D) // Hd
    blkmask = (head_of[:, None] == jnp.arange(H)[None, :]).astype(dtype)
    q_blk = q[:, :, None] * blkmask[None]  # [B, D, H]
    logits = jnp.einsum(
        "bsd,bdh->bsh", k, q_blk, preferred_element_type=jnp.float32
    )
    p = jax.nn.softmax(logits, axis=1)  # over S, f32
    # out[b, d] = sum_s p[b, s, head_of(d)] * v[b, s, d]; head blocks are
    # contiguous so the per-head probability row repeats across its Hd dims
    p_d = jnp.repeat(p.astype(dtype), Hd, axis=2)  # [B, S, D]
    out = jnp.einsum(
        "bsd,bsd->bd", p_d, v, preferred_element_type=jnp.float32
    ).astype(dtype)
    return jnp.einsum("bd,de->be", out, blk["o_w"].astype(dtype))[:, None] + blk[
        "o_b"
    ].astype(dtype)


def _block_cls(x: jax.Array, blk: Params, cfg: TowerConfig,
               s_real: int | None = None) -> jax.Array:
    """Last encoder block truncated to the CLS row -> [B, 1, D].

    Exact-FLOP reduction, identical math: after the final layer only
    ``x[:, 0]`` is ever read (CLS pooling at ``encode_image``), so the last
    block's Q projection, attention rows 1.., out-projection rows 1.., and
    the whole MLP over rows 1.. are dead computation — ~3.5% of the total
    forward FLOPs at ViT-L/14 (the MLP alone is 4.3 of the layer's 7.0
    GFLOP/image). K/V still read every token, preserving the CLS row's
    dependency on the full sequence.
    """
    xn = _layer_norm(x, blk["ln1_scale"], blk["ln1_bias"], cfg.layernorm_eps)
    c = x[:, :1] + _attention_cls(xn, blk, cfg, s_real)
    c = c + _mlp(_layer_norm(c, blk["ln2_scale"], blk["ln2_bias"], cfg.layernorm_eps), blk, cfg)
    return c


def _block_eos(
    x: jax.Array, blk: Params, cfg: TowerConfig, eos_pos: jax.Array
) -> jax.Array:
    """Last TEXT block truncated to each row's pooled (first-EOS) position.

    The text-tower analogue of ``_block_cls``: HF CLIP pools the final
    hidden state at the first EOS token, so the last layer's work on every
    other position is dead. The pooled position varies per batch element —
    the query row is gathered at ``eos_pos[b]`` and the causal mask becomes
    an explicit column mask ``col <= eos_pos[b]`` (identical to row
    ``eos_pos[b]`` of the full causal mask). Returns [B, 1, D].
    """
    B, S, D = x.shape
    H, Hd = cfg.num_heads, cfg.head_dim
    dtype = x.dtype
    rows = jnp.arange(B)

    xn = _layer_norm(x, blk["ln1_scale"], blk["ln1_bias"], cfg.layernorm_eps)
    w = blk["qkv_w"].astype(dtype)
    b = blk["qkv_b"].astype(dtype)
    xq = xn[rows, eos_pos][:, None]  # [B, 1, D]
    q = (jnp.einsum("bsd,de->bse", xq, w[:, :D]) + b[:D]) * float(Hd**-0.5)
    k = jnp.einsum("bsd,de->bse", xn, w[:, D : 2 * D]) + b[D : 2 * D]
    v = jnp.einsum("bsd,de->bse", xn, w[:, 2 * D :]) + b[2 * D :]
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk",
        q.reshape(B, 1, H, Hd),
        k.reshape(B, S, H, Hd),
        preferred_element_type=jnp.float32,
    )
    col = jnp.arange(S)[None, None, None, :]
    logits = jnp.where(col <= eos_pos[:, None, None, None], logits, NEG_INF)
    p = jax.nn.softmax(logits, axis=-1).astype(dtype)
    out = (
        jnp.einsum(
            "bhqk,bkhd->bqhd", p, v.reshape(B, S, H, Hd),
            preferred_element_type=jnp.float32,
        )
        .astype(dtype)
        .reshape(B, 1, D)
    )
    attn = jnp.einsum("bsd,de->bse", out, blk["o_w"].astype(dtype)) + blk["o_b"].astype(dtype)
    c = x[rows, eos_pos][:, None] + attn
    c = c + _mlp(_layer_norm(c, blk["ln2_scale"], blk["ln2_bias"], cfg.layernorm_eps), blk, cfg)
    return c


def _encoder_skip_last(
    x: jax.Array, blocks: Params, cfg: TowerConfig, causal: bool,
    s_real: int | None = None,
) -> jax.Array:
    """Run blocks[0..L-2] while scanning the FULL stacked weights.

    ``jax.tree.map(lambda a: a[:-1], blocks)`` before a scan materializes a
    copy of nearly the whole stacked parameter tree every call (~0.58 GB at
    bf16 ViT-L — ~1 ms of HBM traffic at batch rate). Scanning all L
    entries and skipping the last via ``lax.cond`` reads the original
    buffers in place; the final iteration costs one unused 25 MB weight
    DMA instead.
    """
    L = jax.tree.leaves(blocks)[0].shape[0]

    def body(carry, blk):
        h, i = carry
        h = jax.lax.cond(
            i < L - 1, lambda a: _block(a, blk, cfg, causal, s_real),
            lambda a: a, h,
        )
        return (h, i + 1), None

    (x, _), _ = jax.lax.scan(body, (x, jnp.asarray(0, jnp.int32)), blocks)
    return x


def _run_head_blocks(
    x: jax.Array, blocks: Params, cfg: TowerConfig, causal: bool,
    s_real: int | None = None,
) -> jax.Array:
    """Dispatch for the truncated-last-layer paths: ISX_CLS_COND=1
    (default) scans the full stack with a skip-last cond; =0 slices the
    stack to L-1 layers first (the A/B control — pays the stack copy)."""
    import os as _os

    if _os.environ.get("ISX_CLS_COND", "1") == "1":
        return _encoder_skip_last(x, blocks, cfg, causal, s_real)
    head = jax.tree.map(lambda a: a[:-1], blocks)
    return _encoder(x, head, cfg, causal, remat=False, s_real=s_real)


def _encoder(
    x: jax.Array, blocks: Params, cfg: TowerConfig, causal: bool,
    remat: bool = False, s_real: int | None = None,
) -> jax.Array:
    """Run all stacked blocks with lax.scan (one trace for L layers).

    remat=True wraps the block in jax.checkpoint: activations are
    recomputed in the backward pass instead of stored for all L layers —
    the standard memory/FLOPs trade that lets ViT-L/14 fine-tune at real
    batch sizes on a 16 GB chip. No effect on inference.

    ISX_REMAT_POLICY=<name> selects a jax.checkpoint_policies entry (e.g.
    ``dots_with_no_batch_dims_saveable``: save matmul outputs, recompute
    only elementwise/LN work) — the spectrum between full remat (max
    recompute, min memory) and no remat (no recompute, activations for
    all L layers live). Benchmarked in benchmarks/train_step_bench.py.
    """
    block = _block
    if remat:
        import os as _os

        pol_name = _os.environ.get("ISX_REMAT_POLICY", "")
        policy = getattr(jax.checkpoint_policies, pol_name) if pol_name else None
        block = jax.checkpoint(_block, static_argnums=(2, 3), policy=policy)

    def body(h, blk):
        return block(h, blk, cfg, causal, s_real), None

    x, _ = jax.lax.scan(body, x, blocks)
    return x


# ---------------------------------------------------------------------------
# Towers
# ---------------------------------------------------------------------------


def patchify(pixels: jax.Array, patch: int) -> jax.Array:
    """[B, H, W, C] -> [B, (H/p)*(W/p), p*p*C] with (ph, pw, c) minor order.

    Matches a stride-p VALID conv whose [D, C, p, p] weight has been
    reshaped to [p*p*C, D] via ``w.transpose(2, 3, 1, 0)`` (convert.py).
    """
    B, H, W, C = pixels.shape
    gh, gw = H // patch, W // patch
    x = pixels.reshape(B, gh, patch, gw, patch, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B, gh, gw, ph, pw, C
    return x.reshape(B, gh * gw, patch * patch * C)


def encode_text(
    params: Params,
    cfg: CLIPConfig,
    input_ids: jax.Array,
    compute_dtype: jnp.dtype = jnp.float32,
    normalize: bool = False,
    remat: bool = False,
) -> jax.Array:
    """Text -> [B, projection_dim] embedding.

    Mirrors the behavioral contract of the reference's
    ``embed_anything.embed`` call (``server/src/clip.rs:19-23``): text into
    the shared CLIP space. Pooled at the first EOS position, projected, and
    optionally l2-normalized (the reference stores unnormalized vectors and
    delegates cosine to the DB; we normalize at the index boundary instead).
    """
    t = params["text"]
    tc = cfg.text
    B, S = input_ids.shape

    x = t["token_embedding"][input_ids] + t["position_embedding"][:S]
    x = x.astype(compute_dtype)

    # HF CLIP pools at the first EOS token (pad == EOS for CLIP's tokenizer).
    eos_pos = jnp.argmax((input_ids == tc.eos_token_id).astype(jnp.int32), axis=-1)

    # EOS-only last layer (inference): the text analogue of the vision
    # tower's CLS-only block — only the pooled row survives, so the final
    # block runs just that row (see _block_eos). ISX_EOS_LAST=0 disables.
    import os as _os

    eos_last = not remat and _os.environ.get("ISX_EOS_LAST", "1") == "1"
    if eos_last and tc.num_layers > 1:
        last = jax.tree.map(lambda a: a[-1], t["blocks"])
        x = _run_head_blocks(x, t["blocks"], tc, causal=True)
        pooled = _block_eos(x, last, tc, eos_pos)[:, 0]
    else:
        x = _encoder(x, t["blocks"], tc, causal=True, remat=remat)
        pooled = x[jnp.arange(B), eos_pos]
    pooled = _layer_norm(
        pooled, t["final_ln_scale"], t["final_ln_bias"], tc.layernorm_eps
    )

    emb = jnp.einsum("bd,dp->bp", pooled, t["projection"].astype(pooled.dtype))
    if normalize:
        emb = l2_normalize(emb)
    return emb


def encode_image(
    params: Params,
    cfg: CLIPConfig,
    pixels: jax.Array,
    compute_dtype: jnp.dtype = jnp.float32,
    normalize: bool = False,
    remat: bool = False,
) -> jax.Array:
    """Preprocessed pixels [B, H, W, 3] (NHWC, normalized) -> [B, proj_dim].

    The TPU-native counterpart of the reference's per-scan Burn forward
    (``server/src/clip.rs:118``). NHWC input; patchify is a reshape + matmul.
    """
    v = params["vision"]
    vc = cfg.vision
    B = pixels.shape[0]

    patches = patchify(pixels.astype(compute_dtype), vc.patch_size)
    x = jnp.einsum("bnk,kd->bnd", patches, v["patch_embedding"].astype(compute_dtype))

    cls = jnp.broadcast_to(v["class_embedding"].astype(compute_dtype), (B, 1, vc.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + v["position_embedding"].astype(compute_dtype)

    x = _layer_norm(x, v["pre_ln_scale"], v["pre_ln_bias"], vc.layernorm_eps)

    import os as _os

    # ISX_VIT_SPAD=<Sp>: zero-pad the sequence ONCE to the aligned Sp and
    # keep it padded through every layer (round-4 verdict #8 / PERF_NOTES
    # round-3 attention close: the one listed idea never measured end to
    # end). Attention runs the split-key kernel on pre-padded operands —
    # no per-call HBM pad/slice, [S, 256]+[S, 8] MXU tiles instead of the
    # 257->384 lane pad — with pad keys masked by index; LN/MLP rows
    # >= s_real compute garbage that is never read (CLS pooling reads row
    # 0). Inference only; requires Sp == (S//128)*128 + 8 (the split
    # kernel's tail quantum), e.g. 264 for ViT-L/14's S=257.
    s_real = None
    spad = 0 if remat else int(_os.environ.get("ISX_VIT_SPAD", "0") or 0)
    S0 = x.shape[1]
    if spad > S0 and (
        jax.default_backend() == "tpu"
        or _os.environ.get("ISX_VIT_SPAD_CPU") == "1"
    ):
        from image_search_tpu.ops.attention import split_regime

        if split_regime(S0):
            # off-regime models (e.g. tiny test towers, other patch
            # grids) silently ignore the flag — it is shape-specific
            if spad != (S0 // 128) * 128 + 8:
                raise ValueError(
                    f"ISX_VIT_SPAD={spad} invalid for S={S0}: need "
                    f"Sp == (S//128)*128 + 8 (the split kernel's tail)"
                )
            x = jnp.pad(x, ((0, 0), (0, spad - S0), (0, 0)))
            s_real = S0

    # CLS-only last layer (inference): only x[:, 0] survives this function,
    # so the final block runs just the CLS row (K/V still over all tokens) —
    # same output, ~3.5% fewer FLOPs (see _block_cls). Training keeps the
    # full L-layer scan: ZeRO-3 shards the stacked [L, ...] weights along L,
    # and slicing layer L-1 out of the scan would force a re-shard there.
    # ISX_CLS_LAST=0 restores the full scan for A/B measurement.
    cls_last = not remat and _os.environ.get("ISX_CLS_LAST", "1") == "1"
    if cls_last and vc.num_layers > 1:
        last = jax.tree.map(lambda a: a[-1], v["blocks"])
        x = _run_head_blocks(x, v["blocks"], vc, causal=False, s_real=s_real)
        pooled = _block_cls(x, last, vc, s_real)[:, 0]
    else:
        x = _encoder(x, v["blocks"], vc, causal=False, remat=remat,
                     s_real=s_real)
        pooled = x[:, 0]  # class token
    pooled = _layer_norm(pooled, v["post_ln_scale"], v["post_ln_bias"], vc.layernorm_eps)

    emb = jnp.einsum("bd,dp->bp", pooled, v["projection"].astype(pooled.dtype))
    if normalize:
        emb = l2_normalize(emb)
    return emb


def l2_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    n = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
    return (x.astype(jnp.float32) / jnp.maximum(n, eps)).astype(x.dtype)


def forward(
    params: Params,
    cfg: CLIPConfig,
    input_ids: jax.Array,
    pixels: jax.Array,
    compute_dtype: jnp.dtype = jnp.float32,
    remat: bool = False,
):
    """Full contrastive forward: returns (image_emb, text_emb, logit_scale).

    Embeddings are l2-normalized; ``logits = scale * img @ txt.T`` is left to
    the caller (the training step psums it across the batch shards).
    """
    img = encode_image(params, cfg, pixels, compute_dtype, normalize=True, remat=remat)
    txt = encode_text(params, cfg, input_ids, compute_dtype, normalize=True, remat=remat)
    scale = jnp.exp(params["logit_scale"].astype(jnp.float32))
    return img, txt, scale


# ---------------------------------------------------------------------------
# Initialization (random weights; real deployments load an HF checkpoint)
# ---------------------------------------------------------------------------


def _init_tower_blocks(key: jax.Array, cfg: TowerConfig, dtype) -> Params:
    L, D, M = cfg.num_layers, cfg.hidden_size, cfg.mlp_size
    ks = jax.random.split(key, 6)
    s = D**-0.5

    def w(k, shape, scale):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    zeros = lambda shape: jnp.zeros(shape, dtype)
    ones = lambda shape: jnp.ones(shape, dtype)
    return {
        "ln1_scale": ones((L, D)),
        "ln1_bias": zeros((L, D)),
        "qkv_w": w(ks[0], (L, D, 3 * D), s),
        "qkv_b": zeros((L, 3 * D)),
        "o_w": w(ks[3], (L, D, D), s),
        "o_b": zeros((L, D)),
        "ln2_scale": ones((L, D)),
        "ln2_bias": zeros((L, D)),
        "fc_w": w(ks[4], (L, D, M), s),
        "fc_b": zeros((L, M)),
        "proj_w": w(ks[5], (L, M, D), M**-0.5),
        "proj_b": zeros((L, D)),
    }


def init_params(key: jax.Array, cfg: CLIPConfig, dtype=jnp.float32) -> Params:
    """Randomly initialized parameter pytree with the checkpoint layout."""
    kt, kv, k1, k2, k3, k4, k5, k6, k7 = jax.random.split(key, 9)
    tc, vc = cfg.text, cfg.vision
    patch_dim = vc.patch_size * vc.patch_size * 3

    def w(k, shape, scale):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    text = {
        "token_embedding": w(k1, (tc.vocab_size, tc.hidden_size), 0.02),
        "position_embedding": w(k2, (tc.context_length, tc.hidden_size), 0.01),
        "blocks": _init_tower_blocks(kt, tc, dtype),
        "final_ln_scale": jnp.ones((tc.hidden_size,), dtype),
        "final_ln_bias": jnp.zeros((tc.hidden_size,), dtype),
        "projection": w(k3, (tc.hidden_size, cfg.projection_dim), tc.hidden_size**-0.5),
    }
    vision = {
        "patch_embedding": w(k4, (patch_dim, vc.hidden_size), patch_dim**-0.5),
        "class_embedding": w(k5, (vc.hidden_size,), 0.02),
        "position_embedding": w(k6, (vc.seq_len, vc.hidden_size), 0.01),
        "pre_ln_scale": jnp.ones((vc.hidden_size,), dtype),
        "pre_ln_bias": jnp.zeros((vc.hidden_size,), dtype),
        "blocks": _init_tower_blocks(kv, vc, dtype),
        "post_ln_scale": jnp.ones((vc.hidden_size,), dtype),
        "post_ln_bias": jnp.zeros((vc.hidden_size,), dtype),
        # k7, NOT k3: reusing the text projection's key correlated the two
        # towers' output spaces in from-scratch training
        "projection": w(k7, (vc.hidden_size, cfg.projection_dim), vc.hidden_size**-0.5),
    }
    return {
        "text": text,
        "vision": vision,
        "logit_scale": jnp.asarray(cfg.logit_scale_init, jnp.float32),
    }


def num_params(params: Params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
