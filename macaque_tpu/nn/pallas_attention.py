"""Fused multi-head attention as a Pallas TPU kernel.

For ViTPose's fixed tiny sequence (192 tokens, 16 heads, head_dim 80) a
flash-style streaming softmax is unnecessary — the whole (N, N) logit
tile fits in VMEM — but fusing QK^T -> softmax -> PV into one kernel
keeps the logits out of HBM entirely (XLA otherwise materializes the
(B, H, N, N) tensor between ops). One grid step per (batch, head).

Falls back to ``jax.nn.dot_product_attention`` on non-TPU backends
(tests run the kernel in interpreter mode for parity).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)   # (N, D)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                          # (N, N)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def fused_attention(q, k, v, interpret: bool = False):
    """q, k, v: (B, N, H, D) -> (B, N, H, D), softmax(QK^T/sqrt(D))V.

    Grid = (B*H,); each step holds one head's (N, D) panels in VMEM.
    """
    B, N, H, D = q.shape
    scale = D ** -0.5

    def to_bh(x):  # (B, N, H, D) -> (B*H, N, D)
        return jnp.swapaxes(x, 1, 2).reshape(B * H, N, D)

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)

    spec = pl.BlockSpec((1, N, D), lambda i: (i, 0, 0),
                        memory_space=pl.ANY if interpret else pltpu.VMEM)
    out = pl.pallas_call(
        partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B * H, N, D), q.dtype),
        grid=(B * H,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(qb, kb, vb)
    return jnp.swapaxes(out.reshape(B, H, N, D), 1, 2)


def _attn_kernel_blocked(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                         heads: int):
    # one batch sample per grid step; heads iterate on the leading block
    # dim (free indexing — no lane relayout), logits stay in VMEM/registers
    for h in range(heads):
        q = q_ref[0, h].astype(jnp.float32)   # (N, D)
        k = k_ref[0, h].astype(jnp.float32)
        v = v_ref[0, h].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[0, h] = jnp.dot(
            p, v, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def fused_attention_blocked(q, k, v, interpret: bool = False):
    """Head-blocked variant: grid over batch only; per step all heads'
    (N, D) panels live in VMEM and the 16 head attentions run back to
    back (~1.5 MB/step for ViT-huge crops)."""
    B, N, H, D = q.shape
    scale = D ** -0.5

    def to_bhnd(x):  # (B, N, H, D) -> (B, H, N, D)
        return jnp.swapaxes(x, 1, 2)

    qb, kb, vb = to_bhnd(q), to_bhnd(k), to_bhnd(v)
    spec = pl.BlockSpec((1, H, N, D), lambda i: (i, 0, 0, 0),
                        memory_space=pl.ANY if interpret else pltpu.VMEM)
    out = pl.pallas_call(
        partial(_attn_kernel_blocked, scale=scale, heads=H),
        out_shape=jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
        grid=(B,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(qb, kb, vb)
    return jnp.swapaxes(out, 1, 2)


def _attn_kernel_packed(qkv_ref, o_ref, *, heads: int, head_dim: int,
                        scale: float):
    # dots stay in the input dtype (bf16 in production) with f32
    # accumulation — f32 MXU issue rate is 1/4 of bf16. Softmax
    # statistics stay f32. The block holds G sequences per grid step
    # (the kernel is DMA-pipeline bound at G=1: 64 steps x 1.5 MB
    # measured ~42 ms/16-frame chunk on v5e) with per-head batched dots.
    C = heads * head_dim
    for h in range(heads):
        lo = h * head_dim
        q = qkv_ref[:, :, lo : lo + head_dim]            # (G, N, D)
        k = qkv_ref[:, :, C + lo : C + lo + head_dim]
        v = qkv_ref[:, :, 2 * C + lo : 2 * C + lo + head_dim]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[:, :, lo : lo + head_dim] = jax.lax.dot_general(
            p.astype(qkv_ref.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("heads", "interpret"))
def fused_attention_packed(qkv, heads: int, interpret: bool = False,
                           block: int = 8):
    """Attention directly on the packed qkv activation (B, N, 3C) — the
    layout the qkv Dense produces — writing (B, N, C) for the output
    projection. No HBM layout changes: head slicing happens in VMEM.
    ``block`` sequences are processed per grid step so the input DMA
    pipelines deeply (the kernel is transfer-bound at block=1; measured
    v5e ViT-huge pose chunk: 216 ms at block 2, 196 at 8, 200 at 16);
    the compiler's default 16 MB scoped-VMEM budget is raised to fit.
    """
    B, N, C3 = qkv.shape
    C = C3 // 3
    D = C // heads
    scale = D ** -0.5
    G = block
    while B % G:
        G //= 2
    out = pl.pallas_call(
        partial(_attn_kernel_packed, heads=heads, head_dim=D, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B, N, C), qkv.dtype),
        grid=(B // G,),
        in_specs=[pl.BlockSpec(
            (G, N, C3), lambda i: (i, 0, 0),
            memory_space=pl.ANY if interpret else pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (G, N, C), lambda i: (i, 0, 0),
            memory_space=pl.ANY if interpret else pltpu.VMEM),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qkv)
    return out


def _window_attn_kernel(qkv_ref, bias_ref, mask_ref, o_ref, *, heads: int,
                        head_dim: int, scale: float, with_mask: bool):
    C = heads * head_dim
    for h in range(heads):
        lo = h * head_dim
        q = qkv_ref[0, :, lo : lo + head_dim].astype(jnp.float32)
        k = qkv_ref[0, :, C + lo : C + lo + head_dim].astype(jnp.float32)
        v = qkv_ref[0, :, 2 * C + lo : 2 * C + lo + head_dim].astype(
            jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = s + bias_ref[h]
        if with_mask:
            s = s + mask_ref[0]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[0, :, lo : lo + head_dim] = jnp.dot(
            p, v, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("heads", "interpret"))
def fused_window_attention(qkv, bias, mask, heads: int,
                           interpret: bool = False):
    """Swin window attention on packed qkv (nW, T, 3C) with relative
    position bias (heads, T, T) and optional per-window shift mask
    (nW, T, T) (pass None when unshifted). One grid step per window.

    Measured (v5e, Swin-S @ 800x608): 12.3 vs 5.1 ms/img against the XLA
    einsum path — thousands of grid steps of tiny (49, 32) matmuls are
    pipeline-bound. Needs multi-window blocking (G windows per step with
    batched dots) to win; kept opt-in for that follow-up."""
    nW, T, C3 = qkv.shape
    C = C3 // 3
    D = C // heads
    scale = D ** -0.5
    with_mask = mask is not None
    if not with_mask:
        mask = jnp.zeros((1, 1, 1), qkv.dtype)

    mem = pl.ANY if interpret else pltpu.VMEM
    in_specs = [
        pl.BlockSpec((1, T, C3), lambda i: (i, 0, 0), memory_space=mem),
        pl.BlockSpec((heads, T, T), lambda i: (0, 0, 0), memory_space=mem),
        (pl.BlockSpec((1, T, T), lambda i: (i, 0, 0), memory_space=mem)
         if with_mask else
         pl.BlockSpec((1, 1, 1), lambda i: (0, 0, 0), memory_space=mem)),
    ]
    out = pl.pallas_call(
        partial(_window_attn_kernel, heads=heads, head_dim=D, scale=scale,
                with_mask=with_mask),
        out_shape=jax.ShapeDtypeStruct((nW, T, C), qkv.dtype),
        grid=(nW,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, T, C), lambda i: (i, 0, 0),
                               memory_space=mem),
        interpret=interpret,
    )(qkv, bias, mask)
    return out


def _window_attn_kernel_g(qkv_ref, bias_ref, mask_ref, o_ref, *,
                          heads: int, head_dim: int, scale: float,
                          with_mask: bool):
    # dots in the input dtype (bf16 production) with f32 accumulation —
    # f32 MXU issue rate is 1/4 of bf16; softmax statistics stay f32
    C = heads * head_dim
    for h in range(heads):
        lo = h * head_dim
        q = qkv_ref[:, :, lo : lo + head_dim]
        k = qkv_ref[:, :, C + lo : C + lo + head_dim]
        v = qkv_ref[:, :, 2 * C + lo : 2 * C + lo + head_dim]
        # batched over the G windows in this block
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                       # (G, T, T)
        s = s + bias_ref[h][None]
        if with_mask:
            s = s + mask_ref[:]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(qkv_ref.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, :, lo : lo + head_dim] = o.astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("heads", "block_windows", "interpret"))
def fused_window_attention_blocked(qkv, bias, mask, heads: int,
                                   block_windows: int = 16,
                                   interpret: bool = False):
    """Multi-window variant of :func:`fused_window_attention`: each grid
    step processes ``block_windows`` windows with batched dots, so the
    grid shrinks ~Gx and the MXU sees batched panels.

    Measured (v5e, Swin-S stage-1 shapes, 640 windows): 0.10 vs 0.155 ms
    in isolation against the XLA einsum — but inside the full backbone it
    still loses (8.7 vs 5.1 ms/img at 800x608): XLA fuses the surrounding
    partition/merge reshapes with its einsums, which the kernel boundary
    prevents. Swin therefore defaults to the XLA path; ViT uses
    :func:`fused_attention_packed`, where the packed layout removes the
    boundary cost and the kernel wins."""
    nW, T, C3 = qkv.shape
    C = C3 // 3
    D = C // heads
    scale = D ** -0.5
    with_mask = mask is not None

    G = block_windows
    pad = (-nW) % G
    if pad:
        qkv = jnp.pad(qkv, ((0, pad), (0, 0), (0, 0)))
        if with_mask:
            mask = jnp.pad(mask, ((0, pad), (0, 0), (0, 0)))
    if not with_mask:
        mask = jnp.zeros((G, 1, 1), qkv.dtype)
    nWp = nW + pad

    mem = pl.ANY if interpret else pltpu.VMEM
    in_specs = [
        pl.BlockSpec((G, T, C3), lambda i: (i, 0, 0), memory_space=mem),
        pl.BlockSpec((heads, T, T), lambda i: (0, 0, 0), memory_space=mem),
        (pl.BlockSpec((G, T, T), lambda i: (i, 0, 0), memory_space=mem)
         if with_mask else
         pl.BlockSpec((G, 1, 1), lambda i: (0, 0, 0), memory_space=mem)),
    ]
    out = pl.pallas_call(
        partial(_window_attn_kernel_g, heads=heads, head_dim=D,
                scale=scale, with_mask=with_mask),
        out_shape=jax.ShapeDtypeStruct((nWp, T, C), qkv.dtype),
        grid=(nWp // G,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((G, T, C), lambda i: (i, 0, 0),
                               memory_space=mem),
        interpret=interpret,
    )(qkv, bias, mask)
    return out[:nW]


def attention(q, k, v):
    """Backend-dispatching attention: blocked Pallas kernel on TPU, XLA
    reference elsewhere.

    Measured (v5e, ViT-huge crop shapes 64x192x16x80):
      * XLA einsum attention: 0.56 ms/call
      * naive per-(batch, head) kernel (:func:`fused_attention`): 0.6+ ms
      * head-blocked kernel (:func:`fused_attention_blocked`): 0.35 ms
    In the full ViT block the blocked kernel's layout transposes (which
    XLA otherwise fuses into the attention einsum) eat that gain; the
    packed-qkv kernel (:func:`fused_attention_packed`) avoids them by
    consuming the qkv Dense output directly and wins end to end:
    128.3 vs 140.1 ms per 64-crop ViT-huge apply.
    """
    if jax.default_backend() == "tpu":
        return fused_attention_blocked(q, k, v)
    return jax.nn.dot_product_attention(q, k, v)
