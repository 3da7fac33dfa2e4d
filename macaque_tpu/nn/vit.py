"""ViTPose: plain ViT backbone + deconv heatmap head, in Flax.

Architecture follows the reference's pose config
(model/pose/td-hm_ViTPose-huge_8xb64-210e_coco-256x192_sn_macaque.py):
ViT-huge (depth 32, width 1280, 16 heads, MLP 5120, patch 16 with conv
padding 2, no cls token, learned pos-embed, final LN), HeatmapHead with two
4x4-stride-2 deconvs (256 ch, BN+ReLU) and a 1x1 conv to 17 heatmap
channels at 64x48.

All matmuls run in bfloat16 on TPU with float32 accumulation when
``compute_dtype=bfloat16``; params stay float32.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp
import jax

from macaque_tpu.nn.layers import FusedLayerNorm


@dataclass(frozen=True)
class VitPoseConfig:
    img_size: Tuple[int, int] = (256, 192)  # (H, W)
    patch_size: int = 16
    patch_padding: int = 2
    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    mlp_ratio: float = 4.0
    num_keypoints: int = 17
    deconv_channels: Tuple[int, ...] = (256, 256)
    ln_eps: float = 1e-6
    compute_dtype: Any = jnp.float32
    use_pallas_attention: bool = False  # fused QKV->softmax->PV kernel
    # "int8": weight + dynamic-activation int8 on the block Dense layers
    # (nn/quant.py; pair with quantize_vitpose_params). None: bf16/f32.
    quantize: Any = None
    # int8 Dense implementation: "xla" (quantize chain as XLA ops) or
    # "pallas" (nn/pallas_int8.py fused quantize kernels; bitwise the
    # same quantization). "auto" = xla: the Pallas kernels win the
    # isolated-matmul probe (291/211/301 vs 266/182/284 TF) but LOSE at
    # model level (168 vs 149 ms/chunk) — the kernel boundary forfeits
    # XLA's producer fusion of the quantize chain into LN/gelu
    # (tools/int8_probe round 5; ARCHITECTURE.md §3b).
    int8_impl: str = "auto"
    # tanh-approximated GELU: the erf<->tanh difference (~2e-4 relative)
    # is below bf16 rounding noise, but exact erf keeps XLA's
    # fc1+gelu+fc2 fusion on the VPU long enough to drop the block MLP
    # from ~190 to ~136 TFLOP/s (profiled v5e). None = auto: tanh in
    # bf16/int8 serving, exact erf in f32 (torch-parity tests).
    gelu_approx: Any = None

    @property
    def _gelu_approx(self) -> bool:
        if self.gelu_approx is not None:
            return self.gelu_approx
        return self.compute_dtype == jnp.bfloat16 or self.quantize == "int8"

    @property
    def grid(self) -> Tuple[int, int]:
        h = (self.img_size[0] + 2 * self.patch_padding - self.patch_size) // self.patch_size + 1
        w = (self.img_size[1] + 2 * self.patch_padding - self.patch_size) // self.patch_size + 1
        return h, w


def _dense(cfg, features, name):
    """Dense factory: int8 serving path or the standard bf16/f32 Dense."""
    if cfg.quantize == "int8":
        from macaque_tpu.nn.quant import Int8Dense

        impl = "xla" if cfg.int8_impl == "auto" else cfg.int8_impl
        return Int8Dense(features, impl=impl, name=name)
    return nn.Dense(features, dtype=cfg.compute_dtype, name=name)


class Attention(nn.Module):
    cfg: VitPoseConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        B, N, D = x.shape
        qkv = _dense(c, 3 * D, "qkv")(x)

        if c.use_pallas_attention:
            # packed-qkv kernel: consumes the Dense output layout directly
            from macaque_tpu.nn.pallas_attention import fused_attention_packed

            out = fused_attention_packed(qkv, heads=c.num_heads)
        else:
            q, k, v = jnp.split(qkv, 3, axis=-1)

            def heads(t):
                return t.reshape(B, N, c.num_heads, D // c.num_heads)

            out = jax.nn.dot_product_attention(
                heads(q), heads(k), heads(v)
            ).reshape(B, N, D)
        return _dense(c, D, "proj")(out)


class Block(nn.Module):
    cfg: VitPoseConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = FusedLayerNorm(epsilon=c.ln_eps, name="ln1")(x)
        x = x + Attention(c, name="attn")(h)
        h = FusedLayerNorm(epsilon=c.ln_eps, name="ln2")(x)
        h = _dense(c, int(c.embed_dim * c.mlp_ratio), "fc1")(h)
        h = nn.gelu(h, approximate=c._gelu_approx)
        h = _dense(c, c.embed_dim, "fc2")(h)
        return x + h


class ViTBackbone(nn.Module):
    cfg: VitPoseConfig

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) normalized images -> (B, h, w, D) feature map."""
        c = self.cfg
        x = nn.Conv(
            c.embed_dim,
            kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            padding=[(c.patch_padding, c.patch_padding)] * 2,
            dtype=c.compute_dtype,
            name="patch_embed",
        )(x)
        B, h, w, D = x.shape
        x = x.reshape(B, h * w, D)
        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, h * w, D),
        )
        x = x + pos.astype(x.dtype)
        for i in range(c.depth):
            x = Block(c, name=f"block{i}")(x)
        x = FusedLayerNorm(epsilon=c.ln_eps, name="ln_final")(x)
        return x.reshape(B, h, w, D)


class HeatmapHead(nn.Module):
    """Deconv heatmap head (mmpose HeatmapHead semantics: ConvTranspose
    4x4 s2 + BN + ReLU per stage, then 1x1 conv)."""

    cfg: VitPoseConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        for i, ch in enumerate(c.deconv_channels):
            # 'SAME' + spatially-flipped kernel == torch ConvTranspose2d
            # (k=4, s=2, p=1); see nn/convert.py::_t_deconv
            x = nn.ConvTranspose(
                ch,
                kernel_size=(4, 4),
                strides=(2, 2),
                padding="SAME",
                use_bias=False,
                dtype=c.compute_dtype,
                name=f"deconv{i}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=jnp.float32,
                name=f"bn{i}",
            )(x)
            x = nn.relu(x)
        x = nn.Conv(c.num_keypoints, kernel_size=(1, 1), dtype=jnp.float32,
                    name="final")(x)
        return x


class ViTPose(nn.Module):
    """Top-down 2D pose network. Input (B, 256, 192, 3) normalized crops;
    output (B, 64, 48, 17) heatmaps."""

    cfg: VitPoseConfig = field(default_factory=VitPoseConfig)

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = ViTBackbone(self.cfg, name="backbone")(x)
        return HeatmapHead(self.cfg, name="head")(feat, train=train)
