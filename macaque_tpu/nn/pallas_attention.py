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


def attention(q, k, v):
    """Backend-dispatching attention: Pallas kernel on TPU, XLA reference
    elsewhere.

    Measured note (v5e, ViT-huge shapes 64x192x16x80): XLA's einsum
    attention runs ~10% faster than this single-head-per-step kernel —
    the (192, 80) panels underutilize the 128x128 MXU. Kept for API
    completeness and as the base for a multi-head-blocked variant."""
    if jax.default_backend() == "tpu":
        return fused_attention(q, k, v)
    return jax.nn.dot_product_attention(q, k, v)
