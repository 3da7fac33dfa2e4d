"""Fused dynamic-quantization int8 matmul as a Pallas TPU kernel.

The serving int8 path (nn/quant.py) quantizes activations dynamically:
per-row ``s_x = max|x| / 127``, ``x_q = round(x / s_x)``, int8 MXU dot,
``acc * s_x * s_w`` dequant. Under XLA that chain costs real HBM
traffic around every Dense — the amax reduction and the quantize
elementwise kernel each re-read the bf16 activation, and the int8
``x_q`` makes an HBM round trip before the matmul consumes it.
Measured on v5e at the ViT-huge pose-chunk shapes (M = 64*192,
tools/int8_probe.py round 5):

  | layer | XLA dynamic chain | static-prequant roofline |
  |-------|-------------------|--------------------------|
  | qkv   | 0.447 ms / 270 TF | 0.360 ms / 336 TF |
  | proj  | 0.234 ms / 172 TF | 0.122 ms / 331 TF |
  | fc1   | 0.578 ms / 279 TF | 0.485 ms / 332 TF |
  | fc2   | 0.781 ms / 206 TF | 0.444 ms / 363 TF |

i.e. ~0.63 ms/block of pure quantize-chain overhead, ~40 ms per
flip-test pose chunk.

Kernel design (``_wres``, weights-resident): the int8 weight matrix is
small (<= 6.5 MB for ViT-huge) — park ALL of it in VMEM once (its
block index is grid-invariant, so Pallas DMAs it a single time) and
stream (TM, K) activation panels down the grid. Each step quantizes
its panel once in-register and runs the N tiles as unrolled int8 MXU
dots with the ``s_x * s_w`` (+bias) dequant fused on the int32
accumulator — the activation is read from HBM exactly once, and
nothing else touches HBM. A first attempt that tiled N on the grid
instead lost 2x: every M panel re-streamed the whole weight
(48 x 6.5 MB = 312 MB of DMA for fc1), swamping the MXU.

Numerics match nn/quant.int8_matmul exactly: same f32 row-amax (max
is order-independent), same round/clip, exact int32 accumulation,
same dequant product order. Parity: tests/test_pallas_int8.py.

VERDICT (round 5, measured): OPT-IN, not the default. The split
scheme (:func:`quant_int8_matmul_split`) beats the XLA chain on the
isolated K=1280 shapes (291/211/301 vs 266/182/284 TF on
qkv/proj/fc1; fc2's K=5120 quantize is VPU-bound and stays XLA), but
at MODEL level the full int8 flip-test pose chunk measures 168.4 vs
148.6 ms/chunk — the kernel boundary forfeits XLA's fusion of the
quantize chain into its producers (LayerNorm, gelu), which in context
already pays for most of the chain. Same mechanism as the Swin
window-attention kernel negative (nn/pallas_attention.py
fused_window_attention docstring). ``VitPoseConfig(int8_impl="auto")``
therefore resolves to the XLA chain; the kernels and
tools/int8_probe.py remain as the measured evidence.

Reference context: the quantized serving tier itself is this repo's
own TPU design (the reference serves f32 torch on GPU; tier semantics
in ARCHITECTURE.md §3b); pose model per reference
model/pose/td-hm_ViTPose-huge_8xb64-210e_coco-256x192_sn_macaque.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# weights-resident path cap: the whole int8 weight + a few activation
# panels must fit VMEM alongside double-buffered IO
_WRES_MAX_BYTES = 8 * 1024 * 1024


def _quantize_rows(xf):
    """f32 (TM, K) -> (int8 (TM, K), f32 (TM, 1) scales); exactly the
    nn/quant.int8_matmul chain."""
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    xq = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return xq, s


def _wres_kernel(x_ref, w_ref, ws_ref, b_ref, o_ref, *, tn: int,
                 with_bias: bool):
    xq, s = _quantize_rows(x_ref[:].astype(jnp.float32))
    n_tiles = w_ref.shape[1] // tn
    for j in range(n_tiles):          # unrolled; small temps per tile
        lo = j * tn
        acc = jax.lax.dot_general(
            xq, w_ref[:, lo:lo + tn],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out = acc.astype(jnp.float32) * s * ws_ref[:, lo:lo + tn]
        if with_bias:
            out = out + b_ref[:, lo:lo + tn]
        o_ref[:, lo:lo + tn] = out.astype(o_ref.dtype)


def _tiled_kernel(x_ref, w_ref, ws_ref, b_ref, o_ref, *,
                  with_bias: bool):
    # fallback for weights too large for VMEM residency: N joins the
    # grid (minor, so the x panel stays resident) and the quantize is
    # recomputed per N tile
    xq, s = _quantize_rows(x_ref[:].astype(jnp.float32))
    acc = jax.lax.dot_general(
        xq, w_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * s * ws_ref[:]
    if with_bias:
        out = out + b_ref[:]
    o_ref[:] = out.astype(o_ref.dtype)


def _quantize_kernel(x_ref, xq_ref, s_ref):
    xq, s = _quantize_rows(x_ref[:].astype(jnp.float32))
    xq_ref[:] = xq
    s_ref[:] = s


@partial(jax.jit, static_argnames=("tm", "interpret"))
def quantize_rows(x, *, tm: int = 256, interpret: bool = False):
    """One-pass dynamic row quantization: ``x (M, K) float ->
    (x_q int8 (M, K), s f32 (M, 1))`` with ``s = max|row| / 127``.

    The XLA lowering of the same chain runs the amax reduction and the
    quantize elementwise as separate HBM passes (plus the int8
    round trip); this kernel reads each activation panel once and
    writes only the int8 panel + scales. M must be a multiple of
    ``tm`` (callers pad)."""
    M, K = x.shape
    mem = pl.ANY if interpret else pltpu.VMEM
    return pl.pallas_call(
        _quantize_kernel,
        out_shape=(jax.ShapeDtypeStruct((M, K), jnp.int8),
                   jax.ShapeDtypeStruct((M, 1), jnp.float32)),
        grid=(M // tm,),
        in_specs=[pl.BlockSpec((tm, K), lambda i: (i, 0),
                               memory_space=mem)],
        out_specs=(pl.BlockSpec((tm, K), lambda i: (i, 0),
                                memory_space=mem),
                   pl.BlockSpec((tm, 1), lambda i: (i, 0),
                                memory_space=mem)),
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(x)


@partial(jax.jit, static_argnames=("tm", "out_dtype", "interpret"))
def quant_int8_matmul_split(x, kernel_q, wscale, bias=None, *,
                            tm: int = 256, out_dtype=None,
                            interpret: bool = False):
    """Split scheme: Pallas one-pass quantize (:func:`quantize_rows`)
    + XLA int8 dot with the ``s_x * s_w`` (+bias) dequant fused in its
    epilogue. The dot runs at the static-prequant rate (332-363 TF
    measured, module docstring table) and the quantize pass costs its
    minimal HBM traffic. Same numerics as nn/quant.int8_matmul."""
    out_dtype = out_dtype or x.dtype
    K, N = kernel_q.shape
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    xm = x.reshape(M, K)
    pad_m = (-M) % tm
    if pad_m:
        xm = jnp.pad(xm, ((0, pad_m), (0, 0)))
    xq, s = quantize_rows(xm, tm=tm, interpret=interpret)
    acc = jax.lax.dot_general(
        xq, kernel_q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * s * wscale
    if bias is not None:
        out = out + bias
    out = out.astype(out_dtype)
    if pad_m:
        out = out[:M]
    return out.reshape(*lead, N)


@partial(jax.jit, static_argnames=("tm", "tn", "out_dtype", "interpret"))
def quant_int8_matmul(x, kernel_q, wscale, bias=None, *, tm: int = 256,
                      tn: int = 512, out_dtype=None, interpret: bool = False):
    """``x (..., K) float; kernel_q (K, N) int8; wscale (N,) f32;
    bias (N,) f32 or None -> (..., N)`` in ``out_dtype`` (default
    ``x.dtype``), with per-row dynamic activation quantization fused
    into the matmul (see module docstring).

    Leading dims are flattened to M and padded to a multiple of ``tm``
    (padded rows quantize to zeros and are dropped); N is padded to a
    multiple of ``tn`` (wscale pads with ones, bias with zeros).
    """
    out_dtype = out_dtype or x.dtype
    K, N = kernel_q.shape
    lead = x.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    xm = x.reshape(M, K)

    pad_m = (-M) % tm
    if pad_m:
        xm = jnp.pad(xm, ((0, pad_m), (0, 0)))
    pad_n = (-N) % tn
    if pad_n:
        kernel_q = jnp.pad(kernel_q, ((0, 0), (0, pad_n)))
        wscale = jnp.pad(wscale, (0, pad_n), constant_values=1.0)
        if bias is not None:
            bias = jnp.pad(bias, (0, pad_n))
    Mp, Np = M + pad_m, N + pad_n

    with_bias = bias is not None
    if bias is None:
        bias = jnp.zeros((Np,), jnp.float32)
    ws2 = wscale.astype(jnp.float32).reshape(1, Np)
    b2 = bias.astype(jnp.float32).reshape(1, Np)

    mem = pl.ANY if interpret else pltpu.VMEM
    params = None if interpret else pltpu.CompilerParams(
        dimension_semantics=("arbitrary",),
        vmem_limit_bytes=100 * 1024 * 1024)
    if K * Np <= _WRES_MAX_BYTES:
        out = pl.pallas_call(
            partial(_wres_kernel, tn=tn, with_bias=with_bias),
            out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
            grid=(Mp // tm,),
            in_specs=[
                pl.BlockSpec((tm, K), lambda i: (i, 0), memory_space=mem),
                pl.BlockSpec((K, Np), lambda i: (0, 0), memory_space=mem),
                pl.BlockSpec((1, Np), lambda i: (0, 0), memory_space=mem),
                pl.BlockSpec((1, Np), lambda i: (0, 0), memory_space=mem),
            ],
            out_specs=pl.BlockSpec((tm, Np), lambda i: (i, 0),
                                   memory_space=mem),
            compiler_params=params,
            interpret=interpret,
        )(xm, kernel_q, ws2, b2)
    else:
        params = None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024)
        out = pl.pallas_call(
            partial(_tiled_kernel, with_bias=with_bias),
            out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
            grid=(Mp // tm, Np // tn),  # N minor: x panel stays resident
            in_specs=[
                pl.BlockSpec((tm, K), lambda i, j: (i, 0),
                             memory_space=mem),
                pl.BlockSpec((K, tn), lambda i, j: (0, j),
                             memory_space=mem),
                pl.BlockSpec((1, tn), lambda i, j: (0, j),
                             memory_space=mem),
                pl.BlockSpec((1, tn), lambda i, j: (0, j),
                             memory_space=mem),
            ],
            out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                                   memory_space=mem),
            compiler_params=params,
            interpret=interpret,
        )(xm, kernel_q, ws2, b2)

    if pad_m or pad_n:
        out = out[:M, :N]
    return out.reshape(*lead, N)
