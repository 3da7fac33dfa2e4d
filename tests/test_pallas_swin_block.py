"""Fused Swin block kernel (interpret mode): bit-level parity with the
XLA SwinBackbone, including spatial padding, shifted windows, and the
56-token window padding trick."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from macaque_tpu.nn.swin import SwinBackbone, SwinConfig
from macaque_tpu.nn.pallas_swin_block import (
    fused_swin_block, swin_backbone_apply_fused,
)


def test_fused_backbone_matches_xla_interpret():
    cfg = SwinConfig(embed_dim=16, depths=(2, 2), num_heads=(1, 2))
    model = SwinBackbone(cfg)
    rng = np.random.default_rng(0)
    # 60x44 -> 15x11 tokens: forces spatial pad (to 21x14) and the
    # shifted second block of each stage
    x = jnp.asarray(rng.normal(size=(1, 60, 44, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    # non-trivial rel-bias and params
    variables = jax.tree.map(
        lambda a: a + 0.01 * np.float32(1.0), variables)

    outs_xla = model.apply(variables, x)
    outs_fused = swin_backbone_apply_fused(
        variables["params"], x, cfg, block_windows=4, interpret=True)

    assert len(outs_xla) == len(outs_fused) == 2
    for a, b in zip(outs_xla, outs_fused):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-5)


def test_fused_backbone_batch2():
    cfg = SwinConfig(embed_dim=16, depths=(1, 1), num_heads=(1, 2))
    model = SwinBackbone(cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 56, 56, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(1), x)
    outs_xla = model.apply(variables, x)
    outs_fused = swin_backbone_apply_fused(
        variables["params"], x, cfg, block_windows=8, interpret=True)
    for a, b in zip(outs_xla, outs_fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-5)


def test_fused_block_window_pad_neutral():
    """The 49->56 token pad must not leak into real-token outputs:
    compare against a direct (unpadded) numpy attention."""
    heads, C, nW, N = 2, 16, 4, 49
    rng = np.random.default_rng(2)
    xw = jnp.asarray(rng.normal(size=(nW, N, C)).astype(np.float32))
    tok_valid = jnp.ones((nW, N), bool)
    params = {
        "ln1": {"scale": jnp.ones(C), "bias": jnp.zeros(C)},
        "ln2": {"scale": jnp.ones(C), "bias": jnp.zeros(C)},
        "qkv": {"kernel": jnp.asarray(
            rng.normal(0, 0.1, (C, 3 * C)).astype(np.float32)),
            "bias": jnp.asarray(
                rng.normal(0, 0.1, 3 * C).astype(np.float32))},
        "proj": {"kernel": jnp.asarray(
            rng.normal(0, 0.1, (C, C)).astype(np.float32)),
            "bias": jnp.zeros(C)},
        "fc1": {"kernel": jnp.asarray(
            rng.normal(0, 0.1, (C, 4 * C)).astype(np.float32)),
            "bias": jnp.zeros(4 * C)},
        "fc2": {"kernel": jnp.asarray(
            rng.normal(0, 0.1, (4 * C, C)).astype(np.float32)),
            "bias": jnp.zeros(C)},
    }
    bias_hnm = jnp.asarray(
        rng.normal(0, 0.2, (heads, N, N)).astype(np.float32))

    out = np.asarray(fused_swin_block(
        xw, tok_valid, params, bias_hnm, None, heads,
        block_windows=2, interpret=True))
    assert out.shape == (nW, N, C)
    assert np.isfinite(out).all()

    # numpy reference without any padding
    def ln(v):
        mu = v.mean(-1, keepdims=True)
        var = (v ** 2).mean(-1, keepdims=True) - mu ** 2
        return (v - mu) / np.sqrt(np.maximum(var, 0) + 1e-5)

    x = np.asarray(xw)
    h = ln(x)
    qkv = h @ np.asarray(params["qkv"]["kernel"]) + \
        np.asarray(params["qkv"]["bias"])
    D = C // heads
    att = np.zeros_like(x)
    for w in range(nW):
        for hd in range(heads):
            lo = hd * D
            q = qkv[w, :, lo:lo + D]
            k = qkv[w, :, C + lo:C + lo + D]
            v = qkv[w, :, 2 * C + lo:2 * C + lo + D]
            s = q @ k.T * D ** -0.5 + np.asarray(bias_hnm[hd])
            p = np.exp(s - s.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            att[w, :, lo:lo + D] = p @ v
    r1 = x + att @ np.asarray(params["proj"]["kernel"])
    h2 = ln(r1)
    from scipy.special import erf

    f1 = h2 @ np.asarray(params["fc1"]["kernel"])
    f1 = 0.5 * f1 * (1 + erf(f1 / np.sqrt(2)))
    want = r1 + f1 @ np.asarray(params["fc2"]["kernel"])
    np.testing.assert_allclose(out, want, atol=1e-4, rtol=1e-4)
