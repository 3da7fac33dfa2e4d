"""Parity tests for the fused dynamic-quant int8 matmul kernel
(nn/pallas_int8.py) against the XLA chain (nn/quant.int8_matmul).

The kernel is designed to be *bitwise* identical to the XLA path: same
f32 row-amax (order-independent max), same round/clip, exact int32
accumulation, same dequant product order. Interpret mode runs the
kernel body on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from macaque_tpu.nn.quant import int8_matmul
from macaque_tpu.nn.pallas_int8 import quant_int8_matmul


def _mk(rng, M, K, N):
    x = jnp.asarray(rng.normal(0, 1, (M, K)).astype(np.float32))
    kq = jnp.asarray(rng.integers(-127, 128, (K, N), dtype=np.int8))
    ws = jnp.asarray(rng.uniform(0.001, 0.01, N).astype(np.float32))
    return x, kq, ws


@pytest.mark.parametrize("M,K,N", [
    (256, 1280, 512),    # exact tiles
    (300, 1280, 640),    # M and N both need padding
    (64, 384, 128),      # small, tm/tn larger than the problem
])
def test_matches_xla_chain_bitwise(M, K, N):
    rng = np.random.default_rng(0)
    x, kq, ws = _mk(rng, M, K, N)
    x = x.astype(jnp.bfloat16)
    ref = int8_matmul(x, kq, ws)
    out = quant_int8_matmul(x, kq, ws, interpret=True)
    assert out.shape == ref.shape and out.dtype == ref.dtype
    np.testing.assert_array_equal(np.asarray(ref, np.float32),
                                  np.asarray(out, np.float32))


def test_bias_fused_in_f32():
    rng = np.random.default_rng(1)
    x, kq, ws = _mk(rng, 128, 256, 256)
    b = jnp.asarray(rng.normal(0, 0.1, 256).astype(np.float32))
    xb = x.astype(jnp.bfloat16)
    out = quant_int8_matmul(xb, kq, ws, b, interpret=True)
    # numpy oracle replicating the chain from the bf16 input: dequant +
    # bias in f32, single bf16 rounding at the end
    xf = np.asarray(xb, np.float32)
    s = (np.maximum(np.abs(xf).max(-1, keepdims=True),
                    np.float32(1e-8)) * np.float32(1.0 / 127.0))
    xq = np.clip(np.round(xf / s), -127, 127).astype(np.int8)
    acc = xq.astype(np.int32) @ np.asarray(kq, np.int32)
    ref32 = acc.astype(np.float32) * s * np.asarray(ws) + np.asarray(b)
    ref = np.asarray(jnp.asarray(ref32).astype(jnp.bfloat16), np.float32)
    np.testing.assert_array_equal(np.asarray(out, np.float32), ref)


def test_3d_leading_dims():
    rng = np.random.default_rng(2)
    x, kq, ws = _mk(rng, 6 * 50, 1280, 384)
    x3 = x.reshape(6, 50, 1280).astype(jnp.bfloat16)
    ref = int8_matmul(x3, kq, ws)
    out = quant_int8_matmul(x3, kq, ws, interpret=True)
    assert out.shape == (6, 50, 384)
    np.testing.assert_array_equal(np.asarray(ref, np.float32),
                                  np.asarray(out, np.float32))


def test_int8dense_pallas_impl_matches_xla_on_cpu_fallback():
    """impl="pallas" falls back to the XLA chain off-TPU — the module
    is backend-portable and numerics are impl-independent."""
    from macaque_tpu.nn.quant import Int8Dense, quantize_dense

    rng = np.random.default_rng(3)
    kernel = rng.normal(0, 0.02, (1280, 512)).astype(np.float32)
    qp = quantize_dense({"kernel": kernel,
                         "bias": np.zeros(512, np.float32)})
    x = jnp.asarray(rng.normal(0, 1, (4, 10, 1280)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    va = {"params": dict(qp)}
    ya = Int8Dense(512, impl="xla").apply(va, x)
    yb = Int8Dense(512, impl="pallas").apply(va, x)
    assert jax.default_backend() != "tpu"
    np.testing.assert_array_equal(np.asarray(ya, np.float32),
                                  np.asarray(yb, np.float32))


def test_vitpose_int8_impl_flag_plumbs():
    """VitPoseConfig(int8_impl=...) selects the Int8Dense impl without
    changing the param tree (converters/quantizers unaffected)."""
    from macaque_tpu.nn import ViTPose, VitPoseConfig
    from macaque_tpu.nn.quant import quantize_vitpose_params

    cfg = dict(img_size=(64, 48), embed_dim=256, depth=2, num_heads=4,
               compute_dtype=jnp.bfloat16)
    base = ViTPose(VitPoseConfig(**cfg))
    v = base.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 48, 3)))
    qv = quantize_vitpose_params(v)
    x = jnp.asarray(np.random.default_rng(4).normal(
        0, 1, (2, 64, 48, 3)).astype(np.float32))
    outs = [
        ViTPose(VitPoseConfig(**cfg, quantize="int8", int8_impl=impl)
                ).apply(qv, x)
        for impl in ("xla", "pallas", "auto")
    ]
    for o in outs[1:]:
        np.testing.assert_array_equal(np.asarray(outs[0], np.float32),
                                      np.asarray(o, np.float32))


def test_tiled_fallback_path_matches(monkeypatch):
    """Weights too large for VMEM residency take the N-on-the-grid
    tiled kernel; force it by shrinking the residency cap."""
    import macaque_tpu.nn.pallas_int8 as pi

    monkeypatch.setattr(pi, "_WRES_MAX_BYTES", 1024)
    # unique shape + cache clear: the wres/tiled branch is decided at
    # trace time, so a cached trace from an equal-shape earlier test
    # would silently bypass the monkeypatched cap
    jax.clear_caches()
    rng = np.random.default_rng(5)
    x, kq, ws = _mk(rng, 200, 1280, 896)
    x = x.astype(jnp.bfloat16)
    ref = int8_matmul(x, kq, ws)
    out = pi.quant_int8_matmul(x, kq, ws, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref, np.float32),
                                  np.asarray(out, np.float32))
