"""Shared NN layers tuned for TPU inference.

FusedLayerNorm: float32 statistics, compute-dtype output. Flax's
``nn.LayerNorm(dtype=float32)`` on a bfloat16 activation materializes the
full-precision result to HBM and the following Dense re-converts it —
two extra elementwise kernels and 2x the write bandwidth per LN call
(profiled ~7 ms of convert_element_type per 16-frame detector chunk on
v5e). Emitting the compute dtype directly is numerically identical on
the matmul path (the consumer cast quantized to bf16 anyway) while XLA
fuses the converts into the reduction kernel.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class FusedLayerNorm(nn.Module):
    """LayerNorm over the last axis: f32 mean/variance, params f32,
    output in the input's dtype (param subtree matches ``nn.LayerNorm``:
    {scale, bias}, so weight converters are unaffected)."""

    epsilon: float = 1e-5
    out_dtype: Any = None  # default: same as input

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,))
        bias = self.param("bias", nn.initializers.zeros, (dim,))
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        # fast variance (E[x^2] - E[x]^2), as flax nn.LayerNorm defaults
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True) \
            - jnp.square(mean)
        inv = jnp.reciprocal(jnp.sqrt(jnp.maximum(var, 0.0) + self.epsilon))
        y = (x32 - mean) * inv * scale + bias
        return y.astype(self.out_dtype or x.dtype)
