import numpy as np
import pytest

import jax
import jax.numpy as jnp

from macaque_tpu.nn.pallas_attention import fused_attention


def test_fused_attention_matches_reference():
    """Pallas kernel (interpreter mode on CPU) vs jax.nn reference."""
    rng = np.random.default_rng(0)
    B, N, H, D = 2, 192, 4, 80
    q = jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
    want = jax.nn.dot_product_attention(q, k, v)
    got = fused_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_blocked_attention_matches_reference():
    from macaque_tpu.nn.pallas_attention import fused_attention_blocked

    rng = np.random.default_rng(1)
    B, N, H, D = 3, 192, 4, 80
    q = jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, N, H, D)).astype(np.float32))
    want = jax.nn.dot_product_attention(q, k, v)
    got = fused_attention_blocked(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
