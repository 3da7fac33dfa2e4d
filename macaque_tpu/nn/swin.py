"""Swin Transformer backbone (Swin-S) in Flax.

Matches the reference's detection backbone
(model/detection/SWIN-Mask_R-CNN_bbox_only.py:33-64): patch 4 with patch
norm, embed 96, depths (2,2,18,2), heads (3,6,12,24), window 7 with
relative position bias, shifted windows on odd blocks, MLP ratio 4,
per-stage output norms, outputs at all 4 stages.

Window partitioning is done with static reshapes (inputs are padded to
window multiples at trace time), so every attention runs as one batched
(num_windows*B, 49, C) kernel on the MXU.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from macaque_tpu.nn.layers import FusedLayerNorm


@dataclass(frozen=True)
class SwinConfig:
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window: int = 7
    mlp_ratio: float = 4.0
    patch_size: int = 4
    ln_eps: float = 1e-5
    compute_dtype: Any = jnp.float32
    use_pallas_attention: bool = False  # packed-qkv fused window attention
    # "int8": serve the block Dense layers (qkv/proj/fc1/fc2) with
    # weight + dynamic-activation int8 (nn/quant.py scheme; v5e MXU
    # int8 runs ~2x bf16). Apply quantize_swin_params to the variables.
    quantize: Any = None

    @property
    def out_channels(self) -> Tuple[int, ...]:
        return tuple(self.embed_dim * (2 ** i) for i in range(len(self.depths)))


def _rel_pos_index(window: int) -> np.ndarray:
    """(W^2, W^2) index into the (2W-1)^2 relative bias table."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))  # (2, W, W)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, W^2, W^2)
    rel = rel.transpose(1, 2, 0) + (window - 1)
    return rel[..., 0] * (2 * window - 1) + rel[..., 1]


def _dense(cfg: "SwinConfig", features: int, name: str,
           use_bias: bool = True):
    """Block Dense layer, switchable to the int8 serving kernel."""
    if cfg.quantize == "int8":
        from macaque_tpu.nn.quant import Int8Dense

        return Int8Dense(features, use_bias=use_bias, name=name)
    return nn.Dense(features, use_bias=use_bias, dtype=cfg.compute_dtype,
                    name=name)


class WindowAttention(nn.Module):
    cfg: SwinConfig
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x, attn_mask=None):
        """x: (B_, N, C) with N = window^2; attn_mask: (nW, N, N) or None."""
        c = self.cfg
        B_, N, C = x.shape
        head_dim = C // self.heads
        qkv = _dense(c, 3 * C, "qkv", use_bias=True)(x)

        table = self.param(
            "rel_bias",
            nn.initializers.truncated_normal(0.02),
            ((2 * c.window - 1) ** 2, self.heads),
        )
        # static one-hot matmul instead of a runtime gather: the index
        # pattern is compile-time constant and TPU gathers are
        # indices-bound (~3 ms/16-frame chunk profiled across stages)
        idx = _rel_pos_index(c.window)
        onehot = jnp.asarray(
            np.eye((2 * c.window - 1) ** 2, dtype=np.float32)[idx.reshape(-1)]
        )
        bias = (onehot @ table).reshape(N, N, self.heads)
        bias_hnm = jnp.transpose(bias, (2, 0, 1))

        if c.use_pallas_attention:
            from macaque_tpu.nn.pallas_attention import (
                fused_window_attention_blocked,
            )

            mask = None
            if attn_mask is not None:
                nW = attn_mask.shape[0]
                mask = jnp.tile(attn_mask, (B_ // nW, 1, 1)).astype(
                    jnp.float32)
            out = fused_window_attention_blocked(
                qkv, bias_hnm.astype(jnp.float32), mask, heads=self.heads
            )
            return _dense(c, C, "proj")(out)

        qkv = qkv.reshape(B_, N, 3, self.heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        scale = head_dim ** -0.5
        attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
        attn = attn + bias_hnm[None]

        if attn_mask is not None:
            nW = attn_mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, self.heads, N, N)
            attn = attn + attn_mask[None, :, None]
            attn = attn.reshape(B_, self.heads, N, N)

        attn = jax.nn.softmax(attn, axis=-1)
        # cast back to the compute dtype for the PV contraction: the bias
        # add promoted attn to f32, and an f32 dot issues at 1/4 the bf16
        # MXU rate
        out = jnp.einsum("bhnm,bmhd->bnhd", attn.astype(v.dtype), v)
        out = out.reshape(B_, N, C)
        return _dense(c, C, "proj")(out)


def _window_partition(x, w):
    B, H, W, C = x.shape
    x = x.reshape(B, H // w, w, W // w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, C)


def _window_merge(x, w, B, H, W):
    C = x.shape[-1]
    x = x.reshape(B, H // w, W // w, w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


def _shift_mask(H, W, w, shift) -> np.ndarray:
    """Attention mask for shifted windows (standard Swin construction)."""
    img = np.zeros((H, W))
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    img = img.reshape(H // w, w, W // w, w).transpose(0, 2, 1, 3).reshape(-1, w * w)
    diff = img[:, :, None] - img[:, None, :]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class SwinBlock(nn.Module):
    cfg: SwinConfig
    dim: int
    heads: int
    shift: int

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        B, H, W, C = x.shape
        w = c.window
        shortcut = x
        x = FusedLayerNorm(epsilon=c.ln_eps, name="ln1")(x)

        pad_h = (w - H % w) % w
        pad_w = (w - W % w) % w
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        Hp, Wp = H + pad_h, W + pad_w

        mask = None
        if self.shift > 0:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(_shift_mask(Hp, Wp, w, self.shift))

        xw = _window_partition(x, w)
        xw = WindowAttention(c, self.dim, self.heads, name="attn")(xw, mask)
        x = _window_merge(xw, w, B, Hp, Wp)

        if self.shift > 0:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = x[:, :H, :W]
        x = shortcut + x

        h = FusedLayerNorm(epsilon=c.ln_eps, name="ln2")(x)
        h = _dense(c, int(C * c.mlp_ratio), "fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = _dense(c, C, "fc2")(h)
        return x + h


class PatchMerging(nn.Module):
    cfg: SwinConfig

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        Hp, Wp = x.shape[1], x.shape[2]
        # channel order [(dy,dx)] = [(0,0),(1,0),(0,1),(1,1)] — identical
        # to the reference concat of the four strided slices, but as one
        # reshape/transpose (strided slices lower as gathers on TPU:
        # ~4 ms/16-frame chunk profiled)
        x = x.reshape(B, Hp // 2, 2, Wp // 2, 2, C)
        x = x.transpose(0, 1, 3, 4, 2, 5)
        x = x.reshape(B, Hp // 2, Wp // 2, 4 * C)
        x = FusedLayerNorm(epsilon=self.cfg.ln_eps, name="ln")(x)
        return nn.Dense(2 * C, use_bias=False, dtype=self.cfg.compute_dtype,
                        name="reduction")(x)


class PatchEmbed(nn.Module):
    """Stride-p patch embedding as space-to-depth + matmul.

    Parameter tree is identical to ``nn.Conv(embed, (p, p), strides
    (p, p))`` — {kernel (p, p, 3, embed), bias} — but XLA's conv with 3
    input channels pads the channel dim and reorders the image layout
    (~6.5 ms/16-frame chunk profiled at 800x608 on v5e); a reshape/
    transpose into (p*p*3)-deep patches followed by one matmul is the
    same contraction in MXU-native form."""

    cfg: SwinConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        p = c.patch_size
        B, H, W, Cin = x.shape
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (p, p, Cin, c.embed_dim),
        )
        bias = self.param("bias", nn.initializers.zeros, (c.embed_dim,))
        patches = x.reshape(B, H // p, p, W // p, p, Cin)
        patches = patches.transpose(0, 1, 3, 2, 4, 5)
        patches = patches.reshape(B, H // p, W // p, p * p * Cin)
        w = kernel.reshape(p * p * Cin, c.embed_dim)
        y = patches.astype(c.compute_dtype) @ w.astype(c.compute_dtype)
        return y + bias.astype(c.compute_dtype)


class SwinBackbone(nn.Module):
    cfg: SwinConfig = field(default_factory=SwinConfig)

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) normalized image -> 4 feature maps at strides
        4, 8, 16, 32."""
        c = self.cfg
        x = PatchEmbed(c, name="patch_embed")(x)
        x = FusedLayerNorm(epsilon=c.ln_eps, name="patch_norm")(x)

        outs = []
        for stage, depth in enumerate(c.depths):
            dim = c.embed_dim * (2 ** stage)
            for b in range(depth):
                shift = 0 if b % 2 == 0 else c.window // 2
                x = SwinBlock(c, dim, c.num_heads[stage], shift,
                              name=f"stage{stage}_block{b}")(x)
            out = FusedLayerNorm(epsilon=c.ln_eps, name=f"out_norm{stage}")(x)
            outs.append(out)
            if stage < len(c.depths) - 1:
                x = PatchMerging(c, name=f"merge{stage}")(x)
        return outs
