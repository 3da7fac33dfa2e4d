"""int8 quantized ViTPose serving path (nn/quant.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_int8_matmul_matches_manual_dequant():
    from macaque_tpu.nn.quant import int8_matmul

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1.5, (5, 7, 32)).astype(np.float32)
    kq = rng.integers(-127, 128, (32, 16), dtype=np.int8)
    ws = rng.uniform(0.005, 0.02, 16).astype(np.float32)

    got = np.asarray(int8_matmul(jnp.asarray(x), jnp.asarray(kq),
                                 jnp.asarray(ws)))

    s = np.maximum(np.abs(x).max(-1, keepdims=True), 1e-8) / 127.0
    xq = np.clip(np.round(x / s), -127, 127)
    want = (xq @ kq.astype(np.int64)) * s * ws
    np.testing.assert_allclose(got, want.astype(np.float32),
                               rtol=1e-5, atol=1e-5)


def test_quantize_dense_roundtrip_error_bound():
    from macaque_tpu.nn.quant import quantize_dense

    rng = np.random.default_rng(1)
    kernel = rng.normal(0, 0.05, (64, 48)).astype(np.float32)
    bias = rng.normal(size=48).astype(np.float32)
    q = quantize_dense({"kernel": jnp.asarray(kernel),
                        "bias": jnp.asarray(bias)})
    dq = np.asarray(q["kernel_q"], np.float32) * np.asarray(q["wscale"])
    # symmetric rounding: |error| <= wscale/2 elementwise
    assert np.all(np.abs(dq - kernel) <= np.asarray(q["wscale"]) / 2 + 1e-9)
    np.testing.assert_array_equal(np.asarray(q["bias"]), bias)


def test_int8_vitpose_close_to_f32():
    """End-to-end: quantized ViTPose heatmaps/keypoints track the f32
    model within quantization tolerance on a small but multi-block
    backbone with realistically scaled random weights."""
    from macaque_tpu.nn import ViTPose, VitPoseConfig
    from macaque_tpu.nn.heatmap import udp_decode
    from macaque_tpu.nn.quant import quantize_vitpose_params

    cfg = VitPoseConfig(img_size=(64, 48), embed_dim=64, depth=4,
                        num_heads=2, deconv_channels=(32, 32))
    model = ViTPose(cfg)
    rng = np.random.default_rng(2)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 48, 3)))

    x = jnp.asarray(rng.normal(0, 1, (2, 64, 48, 3)).astype(np.float32))
    hm32 = np.asarray(model.apply(variables, x))

    q_model = ViTPose(VitPoseConfig(img_size=(64, 48), embed_dim=64,
                                    depth=4, num_heads=2,
                                    deconv_channels=(32, 32),
                                    quantize="int8"))
    q_vars = quantize_vitpose_params(variables)
    hm8 = np.asarray(q_model.apply(q_vars, x))

    # heatmap perturbation bound: quantization noise well below the
    # contrast of any trained net's keypoint peaks. (Keypoint-argmax
    # drift is NOT assertable here: an untrained net's heatmaps are
    # flat noise, so the argmax location is chaotic under any
    # perturbation — with real weights a <5% relative heatmap error
    # keeps prominent peaks sub-pixel stable.)
    rel = np.linalg.norm(hm8 - hm32) / np.linalg.norm(hm32)
    assert rel < 0.05, rel
    # decode must still run end-to-end on the quantized output
    kp8, scores8 = udp_decode(jnp.asarray(hm8))
    assert np.isfinite(np.asarray(kp8)).all()


@pytest.mark.slow
def test_int8_swin_close_to_f32():
    """int8 serving path for the Swin trunk: same features to within
    quantization noise on a tiny backbone."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from macaque_tpu.nn.swin import SwinBackbone, SwinConfig
    from macaque_tpu.nn.quant import quantize_swin_params

    cfg32 = SwinConfig(embed_dim=16, depths=(1, 1), num_heads=(1, 2))
    cfg8 = SwinConfig(embed_dim=16, depths=(1, 1), num_heads=(1, 2),
                      quantize="int8")
    m32 = SwinBackbone(cfg32)
    m8 = SwinBackbone(cfg8)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 56, 56, 3)).astype(np.float32))
    v32 = m32.init(jax.random.PRNGKey(0), x)
    v8 = quantize_swin_params(v32)
    outs32 = m32.apply(v32, x)
    outs8 = m8.apply(v8, x)
    assert len(outs32) == len(outs8) == 2
    for a, b in zip(outs32, outs8):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-9)
        assert rel < 0.05, rel
