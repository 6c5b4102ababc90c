"""Fused LN->matmul kernel parity (interpret mode on CPU) vs the XLA oracle.

The kernel is off the serving path (measured-negative e2e, see
ops/ln_matmul.py STATUS note) but stays correct and differentiable.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_search_tpu.ops.ln_matmul import (
    ln_matmul,
    ln_matmul_core,
    ln_matmul_reference,
    pick_block_m,
)


@pytest.mark.parametrize("M,K,N,bm", [(48, 32, 64, 16), (33, 32, 48, 16)])
def test_ln_matmul_matches_reference(M, K, N, bm):
    """Includes a non-divisible M (tail-block masking path)."""
    ks = jax.random.split(jax.random.key(0), 5)
    x = jax.random.normal(ks[0], (M, K), jnp.float32)
    w = jax.random.normal(ks[1], (K, N), jnp.float32) * 0.1
    b = jax.random.normal(ks[2], (N,), jnp.float32) * 0.1
    ls = 1.0 + jax.random.normal(ks[3], (K,), jnp.float32) * 0.1
    lb = jax.random.normal(ks[4], (K,), jnp.float32) * 0.1

    got = ln_matmul(x, ls, lb, w, b, eps=1e-5, block_m=bm, interpret=True)
    want = ln_matmul_reference(x, ls, lb, w, b, eps=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_ln_matmul_core_gradients_match_reference():
    M, K, N = 24, 32, 16
    ks = jax.random.split(jax.random.key(1), 5)
    x = jax.random.normal(ks[0], (M, K), jnp.float32)
    w = jax.random.normal(ks[1], (K, N), jnp.float32) * 0.2
    b = jax.random.normal(ks[2], (N,), jnp.float32) * 0.1
    ls = 1.0 + jax.random.normal(ks[3], (K,), jnp.float32) * 0.1
    lb = jax.random.normal(ks[4], (K,), jnp.float32) * 0.1

    def loss_core(x, ls, lb, w, b):
        return jnp.sum(ln_matmul_core(x, ls, lb, w, b, 1e-5, 16, True) ** 2)

    def loss_ref(x, ls, lb, w, b):
        return jnp.sum(ln_matmul_reference(x, ls, lb, w, b, eps=1e-5) ** 2)

    ga = jax.grad(loss_core, argnums=(0, 1, 2, 3, 4))(x, ls, lb, w, b)
    gb = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, ls, lb, w, b)
    for a, r in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=1e-4, atol=1e-5)


def test_pick_block_m_respects_budget():
    for K, N in ((1024, 3072), (1024, 4096), (1280, 5120)):
        bm = pick_block_m(K, N)
        need = 2 * bm * K * 2 + 2 * bm * N * 2 + K * N * 2
        assert need <= 14 << 20
