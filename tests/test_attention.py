"""Fused attention kernel parity (interpret mode on CPU) vs the XLA oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_search_tpu.ops.attention import (
    attention_reference,
    fused_attention,
    fused_attention_packed,
)


@pytest.mark.parametrize(
    "B,S,H,Hd,causal",
    [
        (2, 257, 16, 64, False),  # ViT-L/14 vision shape
        (2, 77, 12, 64, True),  # CLIP text shape
        (1, 16, 4, 16, False),
        (3, 9, 2, 8, True),  # odd sizes
    ],
)
def test_fused_matches_reference(B, S, H, Hd, causal):
    ks = jax.random.split(jax.random.key(0), 3)
    q, k, v = (jax.random.normal(kk, (B, S, H, Hd), jnp.float32) * 0.3 for kk in ks)
    want = attention_reference(q, k, v, causal=causal, sm_scale=Hd**-0.5)
    got = fused_attention(q, k, v, causal=causal, sm_scale=Hd**-0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_packed_layout_equals_4d():
    B, S, H, Hd = 2, 33, 4, 16
    ks = jax.random.split(jax.random.key(1), 3)
    q, k, v = (jax.random.normal(kk, (B, S, H, Hd), jnp.float32) for kk in ks)
    a = fused_attention(q, k, v, interpret=True)
    b = fused_attention_packed(
        q.reshape(B, S, H * Hd),
        k.reshape(B, S, H * Hd),
        v.reshape(B, S, H * Hd),
        heads=H,
        interpret=True,
    ).reshape(B, S, H, Hd)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_model_uses_reference_path_on_cpu():
    """On the CPU backend the model must take the plain-XLA path (the Pallas
    kernel only compiles for TPU; interpret mode is test-only)."""
    from image_search_tpu.models.clip import _use_fused_attention

    assert jax.default_backend() == "cpu"
    assert not _use_fused_attention()


@pytest.mark.parametrize("causal", [False, True])
def test_fused_qkv_attention_matches_reference(causal):
    """QKV-fused kernel == project-then-attend oracle (interpret mode)."""
    from image_search_tpu.ops.attention import fused_qkv_attention

    B, S, H, Hd = 2, 33, 4, 16
    D = H * Hd
    ks = jax.random.split(jax.random.key(2), 3)
    x = jax.random.normal(ks[0], (B, S, D), jnp.float32) * 0.3
    qkv_w = jax.random.normal(ks[1], (D, 3 * D), jnp.float32) * 0.1
    qkv_b = jax.random.normal(ks[2], (3 * D,), jnp.float32) * 0.1

    qkv = jnp.einsum("bsd,de->bse", x, qkv_w) + qkv_b
    q, k, v = jnp.split(qkv, 3, axis=-1)
    want = attention_reference(
        q.reshape(B, S, H, Hd) * Hd**-0.5,
        k.reshape(B, S, H, Hd),
        v.reshape(B, S, H, Hd),
        causal=causal,
    ).reshape(B, S, D)

    got = fused_qkv_attention(
        x, qkv_w, qkv_b, heads=H, causal=causal, sm_scale=Hd**-0.5, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_attention_core_gradients_match_reference():
    """custom_vjp (Pallas fwd in interpret mode, XLA bwd) == pure autodiff."""
    from image_search_tpu.ops.attention import attention_core

    B, S, H, Hd = 2, 17, 4, 8
    D = H * Hd
    ks = jax.random.split(jax.random.key(5), 3)
    q, k, v = (jax.random.normal(kk, (B, S, D), jnp.float32) * 0.3 for kk in ks)

    def loss_core(q, k, v):
        return jnp.sum(attention_core(q, k, v, H, False, 0.35, True) ** 2)

    def loss_ref(q, k, v):
        out = attention_reference(
            q.reshape(B, S, H, Hd), k.reshape(B, S, H, Hd), v.reshape(B, S, H, Hd),
            causal=False, sm_scale=0.35,
        ).reshape(B, S, D)
        return jnp.sum(out**2)

    ga = jax.grad(loss_core, argnums=(0, 1, 2))(q, k, v)
    gb = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_packed_qkv_attention_matches_reference():
    """Packed-[q|k|v] kernel (in-kernel sm_scale) == oracle (interpret).

    Off the serving path (measured-negative e2e, see ops/attention.py
    STATUS note) but kept correct: consumes one [B, S, 3D] tensor and
    slices heads in VMEM."""
    from image_search_tpu.ops.attention import attention_qkv_packed_core

    B, S, H, Hd = 2, 19, 4, 8
    D = H * Hd
    for causal in (False, True):
        qkv = jax.random.normal(jax.random.key(7), (B, S, 3 * D), jnp.float32) * 0.4
        q, k, v = jnp.split(qkv, 3, axis=-1)
        want = attention_reference(
            q.reshape(B, S, H, Hd),
            k.reshape(B, S, H, Hd),
            v.reshape(B, S, H, Hd),
            causal=causal,
            sm_scale=Hd**-0.5,
        ).reshape(B, S, D)
        got = attention_qkv_packed_core(qkv, H, causal, Hd**-0.5, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_packed_qkv_attention_gradients_match_reference():
    from image_search_tpu.ops.attention import attention_qkv_packed_core

    B, S, H, Hd = 2, 11, 2, 8
    D = H * Hd
    qkv = jax.random.normal(jax.random.key(8), (B, S, 3 * D), jnp.float32) * 0.3

    def loss_core(qkv):
        return jnp.sum(attention_qkv_packed_core(qkv, H, False, 0.25, True) ** 2)

    def loss_ref(qkv):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = attention_reference(
            q.reshape(B, S, H, Hd), k.reshape(B, S, H, Hd), v.reshape(B, S, H, Hd),
            causal=False, sm_scale=0.25,
        ).reshape(B, S, D)
        return jnp.sum(out**2)

    ga = jax.grad(loss_core)(qkv)
    gb = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-4, atol=1e-5)


def test_split_kernel_matches_reference(rng):
    """Split-key kernel (aligned 256-key main + masked 8-wide tail) must be
    numerically exact vs the oracle at the vision tower's S=257 and at a
    second misaligned regime."""
    from image_search_tpu.ops.attention import (
        attention_reference,
        fused_attention_split,
    )

    for B, S, H, Hd, scale in ((2, 257, 16, 64, 0.125), (3, 130, 4, 32, 0.2)):
        q = rng.normal(size=(B, S, H, Hd)).astype(np.float32)
        k = rng.normal(size=(B, S, H, Hd)).astype(np.float32)
        v = rng.normal(size=(B, S, H, Hd)).astype(np.float32)
        ref = attention_reference(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), sm_scale=scale
        )
        got = fused_attention_split(
            jnp.asarray(q.reshape(B, S, H * Hd)),
            jnp.asarray(k.reshape(B, S, H * Hd)),
            jnp.asarray(v.reshape(B, S, H * Hd)),
            heads=H,
            sm_scale=scale,
            interpret=True,
        ).reshape(B, S, H, Hd)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=2e-5)


def test_split_kernel_rejects_aligned_or_tiny_s():
    from image_search_tpu.ops.attention import fused_attention_split

    q = jnp.zeros((1, 77, 64), jnp.float32)
    with pytest.raises(AssertionError):
        fused_attention_split(q, q, q, heads=4, interpret=True)  # S < 128
    q = jnp.zeros((1, 256, 64), jnp.float32)
    with pytest.raises(AssertionError):
        fused_attention_split(q, q, q, heads=4, interpret=True)  # aligned


def test_split_core_gradients_match_reference(rng):
    """ISX_ATTN_SPLIT must not change training: the split core's VJP (XLA
    oracle backward) equals differentiating the reference directly."""
    from image_search_tpu.ops.attention import (
        attention_reference,
        attention_split_core,
    )

    B, S, H, Hd = 2, 130, 4, 16
    q = jnp.asarray(rng.normal(size=(B, S, H * Hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, S, H * Hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, S, H * Hd)).astype(np.float32))

    def loss_split(q_, k_, v_):
        return jnp.sum(attention_split_core(q_, k_, v_, H, 0.25, True) ** 2)

    def loss_ref(q_, k_, v_):
        out = attention_reference(
            q_.reshape(B, S, H, Hd),
            k_.reshape(B, S, H, Hd),
            v_.reshape(B, S, H, Hd),
            sm_scale=0.25,
        ).reshape(B, S, H * Hd)
        return jnp.sum(out**2)

    g1 = jax.grad(loss_split, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize(
    "B,S,H,Hd,group,causal",
    [
        (2, 257, 16, 64, 4, False),  # vision shape, pipelined groups of 4
        (2, 257, 16, 64, 1, False),  # fully pipelined (one head per group)
        (2, 77, 12, 64, 4, True),  # text shape, causal
        (1, 16, 4, 16, 2, False),
    ],
)
def test_grouped_kernel_matches_reference(B, S, H, Hd, group, causal):
    """Grouped double-buffered kernel == oracle (interpret mode, f32)."""
    from image_search_tpu.ops.attention import fused_attention_grouped

    ks = jax.random.split(jax.random.key(7), 3)
    q, k, v = (jax.random.normal(kk, (B, S, H, Hd), jnp.float32) * 0.3 for kk in ks)
    want = attention_reference(q, k, v, causal=causal, sm_scale=Hd**-0.5)
    got = fused_attention_grouped(
        q.reshape(B, S, H * Hd),
        k.reshape(B, S, H * Hd),
        v.reshape(B, S, H * Hd),
        heads=H,
        group=group,
        causal=causal,
        sm_scale=Hd**-0.5,
        interpret=True,
    ).reshape(B, S, H, Hd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_grouped_kernel_bf16_softmax_close_to_reference():
    """bf16-softmax variant: exp in bf16, normalization exact in f32 —
    error vs the f32 oracle stays at bf16 round-off scale."""
    from image_search_tpu.ops.attention import fused_attention_grouped

    B, S, H, Hd = 2, 64, 4, 16
    ks = jax.random.split(jax.random.key(8), 3)
    q, k, v = (jax.random.normal(kk, (B, S, H, Hd), jnp.float32) * 0.3 for kk in ks)
    want = attention_reference(q, k, v, sm_scale=Hd**-0.5)
    got = fused_attention_grouped(
        q.reshape(B, S, H * Hd),
        k.reshape(B, S, H * Hd),
        v.reshape(B, S, H * Hd),
        heads=H,
        group=2,
        sm_scale=Hd**-0.5,
        bf16_softmax=True,
        interpret=True,
    ).reshape(B, S, H, Hd)
    # bf16 exp carries ~2^-8 relative error into the probabilities
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=2e-2)
    # and stays MUCH closer than an all-bf16 pipeline would
    assert float(jnp.max(jnp.abs(got - want))) < 0.02


def test_grouped_core_gradients_match_reference():
    """ISX_ATTN_PIPE must not change training: grouped core's VJP (XLA
    oracle backward) equals differentiating the reference directly."""
    from image_search_tpu.ops.attention import attention_grouped_core

    B, S, H, Hd = 2, 33, 4, 16
    rng = np.random.default_rng(9)
    q = jnp.asarray(rng.normal(size=(B, S, H * Hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, S, H * Hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, S, H * Hd)).astype(np.float32))

    def loss_grouped(q_, k_, v_):
        return jnp.sum(
            attention_grouped_core(q_, k_, v_, H, 2, False, 0.25, False, True) ** 2
        )

    def loss_ref(q_, k_, v_):
        out = attention_reference(
            q_.reshape(B, S, H, Hd),
            k_.reshape(B, S, H, Hd),
            v_.reshape(B, S, H, Hd),
            sm_scale=0.25,
        ).reshape(B, S, H * Hd)
        return jnp.sum(out**2)

    g1 = jax.grad(loss_grouped, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_fused_backward_matches_oracle_vjp(causal):
    """The fused Pallas backward (interpret mode) == jax.vjp of the oracle,
    directly on (dq, dk, dv) — covers the causal text-tower case and a
    non-uniform cotangent (the gradient tests above reach it only through
    the custom_vjp plumbing)."""
    from image_search_tpu.ops.attention import fused_attention_bwd

    B, S, H, Hd = 2, 13, 4, 8
    D = H * Hd
    ks = jax.random.split(jax.random.key(11), 4)
    q, k, v, g = (jax.random.normal(kk, (B, S, D), jnp.float32) * 0.4 for kk in ks)

    dq, dk, dv = fused_attention_bwd(
        q, k, v, g, heads=H, causal=causal, sm_scale=0.27, interpret=True
    )

    def ref(q_, k_, v_):
        return attention_reference(
            q_.reshape(B, S, H, Hd), k_.reshape(B, S, H, Hd),
            v_.reshape(B, S, H, Hd), causal=causal, sm_scale=0.27,
        ).reshape(B, S, D)

    _, vjp = jax.vjp(ref, q, k, v)
    eq, ek, ev = vjp(g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(eq), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(ek), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(ev), rtol=1e-4, atol=1e-5)


def test_fused_backward_oracle_gate(monkeypatch):
    """ISX_ATTN_FUSED_BWD=0 must route the custom_vjp backward through the
    XLA oracle — and both routes must agree."""
    from image_search_tpu.ops.attention import attention_core

    B, S, H, Hd = 1, 9, 2, 8
    D = H * Hd
    ks = jax.random.split(jax.random.key(3), 3)
    q, k, v = (jax.random.normal(kk, (B, S, D), jnp.float32) * 0.3 for kk in ks)

    def loss(q, k, v):
        return jnp.sum(attention_core(q, k, v, H, True, 0.4, True) ** 2)

    monkeypatch.setenv("ISX_ATTN_FUSED_BWD", "0")
    g_oracle = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    monkeypatch.setenv("ISX_ATTN_FUSED_BWD", "1")
    g_fused = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_oracle):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
