"""int8 quantized serving path for the ViT-huge pose backbone.

v5e's MXU runs int8 at ~2x the bf16 rate (measured on this chip:
315 TFLOP/s static / 277 TFLOP/s with dynamic activation quantization
vs 190 TFLOP/s bf16 on the fc1-shaped matmul) and the four Dense
layers per transformer block are ~97% of ViT-huge's FLOPs, so weight
+ dynamic-activation int8 on just those layers buys a large fraction
of the pose stage back. Scheme:

  * weights: symmetric per-output-channel int8
    (``w_q = round(w / s_w)``, ``s_w = max|w| / 127`` per column)
  * activations: symmetric per-token dynamic int8
    (``s_x = max|x| / 127`` per row, computed on the fly)
  * accumulation in int32, dequantized as ``acc * s_x * s_w``

Everything else (LayerNorm, softmax/attention, patch embed, deconv
head) stays in the bf16 path, so heatmap decode precision is set by
the same f32 decode as the bf16 model. Enable with
``VitPoseConfig(quantize="int8")`` + ``quantize_vitpose_params``.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def int8_matmul(x: jnp.ndarray, kernel_q: jnp.ndarray,
                wscale: jnp.ndarray) -> jnp.ndarray:
    """x (..., K) float; kernel_q (K, N) int8; wscale (N,) f32.
    Returns (..., N) in x.dtype."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    xq = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, kernel_q,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * s * wscale).astype(x.dtype)


class Int8Dense(nn.Module):
    """Drop-in Dense with int8 kernel + per-channel scale params.

    Param subtree: {kernel_q int8 (in, out), wscale f32 (out,),
    bias f32 (out,)}. Fresh inits are zeros — real values come from
    :func:`quantize_dense` / :func:`quantize_vitpose_params`.

    ``impl``: "xla" runs the quantize chain above as XLA ops; "pallas"
    fuses it into the matmul kernel (nn/pallas_int8.py — one HBM read
    of the activation, int8 MXU dot, dequant+bias epilogue; bitwise
    the same quantization) on TPU backends, falling back to the XLA
    chain elsewhere.
    """

    features: int
    use_bias: bool = True
    impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        kernel_q = self.param(
            "kernel_q",
            lambda key, shape: jnp.zeros(shape, jnp.int8),
            (x.shape[-1], self.features),
        )
        wscale = self.param("wscale", nn.initializers.ones, (self.features,))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        if self.impl == "pallas" and jax.default_backend() == "tpu":
            from macaque_tpu.nn.pallas_int8 import quant_int8_matmul_split

            # split scheme wins for K <= ~2048 (one-pass Pallas
            # quantize + XLA int8 dot: 291/211/301 vs 266/182/284 TF on
            # qkv/proj/fc1); at K = 5120 (fc2) the quantize pass is
            # VPU-bound and the XLA chain stays ahead (tools/int8_probe
            # round 5, v5e) — keep it there.
            if x.shape[-1] <= 2048:
                return quant_int8_matmul_split(x, kernel_q, wscale, bias)
        out = int8_matmul(x, kernel_q, wscale)
        if bias is not None:
            out = out + bias.astype(out.dtype)
        return out


def quantize_dense(params: dict) -> dict:
    """{kernel, bias?} f32 Dense params -> Int8Dense params.

    jnp ops throughout: device-resident kernels quantize on-device
    (pulling a ViT-huge param tree to host through a remote-tunneled
    device costs minutes; measured in bench.py round 5), host arrays
    stay a cheap local computation with identical numerics."""
    kernel = jnp.asarray(params["kernel"], jnp.float32)
    wscale = jnp.maximum(jnp.max(jnp.abs(kernel), axis=0), 1e-12) / 127.0
    kernel_q = jnp.clip(jnp.round(kernel / wscale), -127, 127
                        ).astype(jnp.int8)
    out = {"kernel_q": kernel_q, "wscale": wscale.astype(jnp.float32)}
    if "bias" in params:
        out["bias"] = params["bias"]
    return out


def quantize_swin_params(variables: dict) -> dict:
    """Quantize a SwinMaskRCNN (or bare SwinBackbone) variable tree's
    block Dense layers (qkv/proj/fc1/fc2 in every stage block) to the
    Int8Dense layout. FPN / RPN / RoI-head convs and the patch
    embed/merge projections stay in the float path. The returned tree
    applies with ``SwinConfig(quantize="int8")``."""

    def quantize_backbone(bb: dict) -> dict:
        bb = dict(bb)
        for name in list(bb.keys()):
            if "_block" not in name:
                continue
            blk = dict(bb[name])
            attn = dict(blk["attn"])
            attn["qkv"] = quantize_dense(attn["qkv"])
            attn["proj"] = quantize_dense(attn["proj"])
            blk["attn"] = attn
            blk["fc1"] = quantize_dense(blk["fc1"])
            blk["fc2"] = quantize_dense(blk["fc2"])
            bb[name] = blk
        return bb

    variables = jax.tree.map(lambda x: x, variables)  # shallow copy
    params = dict(variables["params"])
    if "backbone" in params:
        params["backbone"] = quantize_backbone(params["backbone"])
    else:  # bare SwinBackbone tree
        params = quantize_backbone(params)
    out = dict(variables)
    out["params"] = params
    return out


def quantize_vitpose_params(variables: dict) -> dict:
    """Quantize a ViTPose variable tree's transformer Dense layers
    (qkv/proj/fc1/fc2 in every block) to the Int8Dense layout. The
    returned tree applies with ``ViTPose(VitPoseConfig(quantize="int8",
    ...))``."""
    variables = jax.tree.map(lambda x: x, variables)  # shallow copy
    params = dict(variables["params"])
    bb = dict(params["backbone"])
    for name in list(bb.keys()):
        if not name.startswith("block"):
            continue
        blk = dict(bb[name])
        attn = dict(blk["attn"])
        attn["qkv"] = quantize_dense(attn["qkv"])
        attn["proj"] = quantize_dense(attn["proj"])
        blk["attn"] = attn
        blk["fc1"] = quantize_dense(blk["fc1"])
        blk["fc2"] = quantize_dense(blk["fc2"])
        bb[name] = blk
    params["backbone"] = bb
    out = dict(variables)
    out["params"] = params
    return out
