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


def test_packed_qkv_attention_matches_reference():
    from macaque_tpu.nn.pallas_attention import fused_attention_packed

    rng = np.random.default_rng(2)
    B, N, H, D = 2, 192, 4, 80
    C = H * D
    qkv = jnp.asarray(rng.normal(size=(B, N, 3 * C)).astype(np.float32))
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def hd(t):
        return t.reshape(B, N, H, D)

    want = jax.nn.dot_product_attention(hd(q), hd(k), hd(v)).reshape(B, N, C)
    got = fused_attention_packed(qkv, heads=H, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.slow
def test_vitpose_pallas_flag_matches_xla():
    """ViTPose forward with the packed pallas attention must match the
    XLA path (interpreter-mode pallas on CPU)."""
    from macaque_tpu.nn import ViTPose, VitPoseConfig
    from macaque_tpu.nn import pallas_attention as pa
    from functools import partial as _partial

    cfg_x = VitPoseConfig(img_size=(64, 48), embed_dim=64, depth=2,
                          num_heads=2, deconv_channels=(8, 8))
    cfg_p = VitPoseConfig(img_size=(64, 48), embed_dim=64, depth=2,
                          num_heads=2, deconv_channels=(8, 8),
                          use_pallas_attention=True)
    mx = ViTPose(cfg_x)
    mp = ViTPose(cfg_p)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 64, 48, 3)).astype(np.float32))
    variables = mx.init(jax.random.PRNGKey(0), x)

    orig = pa.fused_attention_packed
    pa.fused_attention_packed = _partial(orig, interpret=True)
    try:
        got = mp.apply(variables, x)
    finally:
        pa.fused_attention_packed = orig
    want = mx.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)
