"""Fully fused Swin block as one Pallas TPU kernel.

Round-2 measurement showed the attention-ONLY window kernel wins in
isolation but loses in context: the kernel boundary stops XLA from
fusing the surrounding partition/merge/LN/MLP ops, which re-materialize
in HBM (pallas_attention.fused_window_attention_blocked docstring).
The fix is scope: this kernel swallows the WHOLE block —

    LN1 -> qkv Dense -> per-window biased/masked attention -> proj
        -> +residual -> LN2 -> fc1 -> tanh-GELU -> fc2 -> +residual

so per block there is exactly one HBM round trip for the activations
instead of seven.

Key layout trick: Mosaic cannot reshape (7, 7, C) <-> (49, C) (token
count 49 is not a sublane multiple — the round-2 blocker). Windows are
therefore padded to T=56 tokens OUTSIDE the kernel; 56 % 8 == 0, so the
in-kernel (G*56, X) <-> (G, 56, X) splits/merges are tile-aligned and
legal, channel matmuls run at full M = G*56 rows, and attention runs
batched over the G windows of a grid step. Pad columns are masked with
-1e9 for real rows; pad rows see zero bias (finite garbage, dropped at
unpad). All dots run in the input dtype (bf16 production) with f32
accumulation; LN statistics and softmax stay f32.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD_T = 56  # padded window tokens (49 real + 7 pad), sublane-aligned


def _ln(x, scale, bias, eps):
    # identical formula to layers.FusedLayerNorm (fast variance)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) \
        - jnp.square(mu)
    inv = jnp.reciprocal(
        jnp.sqrt(jnp.maximum(var, 0.0) + eps))
    y = (xf - mu) * inv * scale.astype(jnp.float32) \
        + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _erf_poly(x):
    """Abramowitz & Stegun 7.1.26 rational erf (|err| < 1.5e-7 —
    far below bf16 resolution); Mosaic has no erf primitive."""
    a = (0.254829592, -0.284496736, 1.421413741,
         -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a[0] + t * (a[1] + t * (a[2] + t * (a[3] + t * a[4]))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    # erf GELU matching swin.py's nn.gelu(approximate=False) to within
    # the polynomial's 1.5e-7
    xf = x.astype(jnp.float32)
    y = 0.5 * xf * (1.0 + _erf_poly(xf * np.float32(1 / np.sqrt(2))))
    return y.astype(x.dtype)


def _swin_block_kernel(
    x_ref, tvalid_ref, bias_ref, mask_ref,
    ln1s_ref, ln1b_ref, qkvw_ref, qkvb_ref, projw_ref, projb_ref,
    ln2s_ref, ln2b_ref, fc1w_ref, fc1b_ref, fc2w_ref, fc2b_ref,
    o_ref, *,
    heads: int, head_dim: int, windows: int, eps: float,
    with_mask: bool,
):
    G, T = windows, PAD_T
    C = heads * head_dim
    scale = head_dim ** -0.5

    x = x_ref[:]                                   # (G*T, C)
    h = _ln(x, ln1s_ref[:], ln1b_ref[:], eps)
    # spatial-pad tokens are EXACT zeros entering attention in the XLA
    # path (padded after LN1, swin.py SwinBlock); reproduce that so
    # their qkv contributions (bias-only k/v) match bit-for-bit.
    # tvalid arrives pre-shaped (G*T, 1): Mosaic rejects the in-kernel
    # (G, T) -> (G*T, 1) cast (remote-compile bisect, round 3)
    h = jnp.where(tvalid_ref[:] > 0, h, jnp.zeros_like(h))

    qkv = jax.lax.dot_general(
        h, qkvw_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + qkvb_ref[:].astype(x.dtype)  # (G*T, 3C)

    outs = []
    for hd in range(heads):
        lo = hd * head_dim
        q = qkv[:, lo : lo + head_dim].reshape(G, T, head_dim)
        k = qkv[:, C + lo : C + lo + head_dim].reshape(G, T, head_dim)
        v = qkv[:, 2 * C + lo : 2 * C + lo + head_dim].reshape(
            G, T, head_dim)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                                   # (G, T, T)
        s = s + bias_ref[hd][None]
        if with_mask:
            s = s + mask_ref[:]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(x.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)                           # (G, T, hd)
        outs.append(o.reshape(G * T, head_dim))
    attn_out = jnp.concatenate(outs, axis=1)        # (G*T, C)

    proj = jax.lax.dot_general(
        attn_out, projw_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + projb_ref[:].astype(x.dtype)
    r1 = x + proj

    h2 = _ln(r1, ln2s_ref[:], ln2b_ref[:], eps)
    f1 = jax.lax.dot_general(
        h2, fc1w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + fc1b_ref[:].astype(x.dtype)
    f1 = _gelu_exact(f1)
    f2 = jax.lax.dot_general(
        f1, fc2w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + fc2b_ref[:].astype(x.dtype)
    o_ref[:] = r1 + f2


def pad_window_bias(bias_hnm: jnp.ndarray) -> jnp.ndarray:
    """(heads, 49, 49) -> (heads, 56, 56): -1e9 on pad COLUMNS of real
    rows (excluded from softmax), 0 on pad rows (finite garbage)."""
    H, N, _ = bias_hnm.shape
    out = jnp.full((H, PAD_T, PAD_T), -1e9, jnp.float32)
    out = out.at[:, :N, :N].set(bias_hnm.astype(jnp.float32))
    out = out.at[:, N:, :].set(0.0)
    return out


def pad_window_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """(nW, 49, 49) shift mask -> (nW, 56, 56), same pad convention."""
    nW, N, _ = mask.shape
    out = jnp.full((nW, PAD_T, PAD_T), -1e9, jnp.float32)
    out = out.at[:, :N, :N].set(mask.astype(jnp.float32))
    out = out.at[:, N:, :].set(0.0)
    return out


@partial(jax.jit, static_argnames=("heads", "block_windows", "eps",
                                   "interpret"))
def fused_swin_block(
    x_win, tok_valid, params: dict, bias_hnm, mask, heads: int,
    block_windows: int = 8, eps: float = 1e-5, interpret: bool = False,
):
    """Apply one full Swin block to partitioned windows.

    x_win: (nW, 49, C) window tokens (pre-LN residual stream).
    tok_valid: (nW, 49) — False for spatial-pad tokens (those are
      zeroed after LN1, matching the XLA path's pad-after-norm).
    params: {ln1: {scale, bias}, qkv: {kernel, bias},
             proj: {kernel, bias}, ln2: {scale, bias},
             fc1: {kernel, bias}, fc2: {kernel, bias}}.
    bias_hnm: (heads, 49, 49) relative position bias.
    mask: (nW, 49, 49) shift mask or None.
    Returns (nW, 49, C).
    """
    nW, N, C = x_win.shape
    D = C // heads
    with_mask = mask is not None

    G = block_windows
    padw = (-nW) % G
    # token pad 49 -> 56 (+ window pad to a G multiple)
    x = jnp.pad(x_win, ((0, padw), (0, PAD_T - N), (0, 0)))
    tv = jnp.pad(tok_valid.astype(jnp.float32),
                 ((0, padw), (0, PAD_T - N)))
    nWp = nW + padw
    x = x.reshape(nWp * PAD_T, C)
    tv = tv.reshape(nWp * PAD_T, 1)

    bias_p = pad_window_bias(bias_hnm)
    if with_mask:
        mask_p = pad_window_mask(mask)
        if padw:
            mask_p = jnp.pad(mask_p, ((0, padw), (0, 0), (0, 0)))
    else:
        mask_p = jnp.zeros((G, 1, 1), jnp.float32)

    mem = pl.ANY if interpret else pltpu.VMEM
    R = G * PAD_T

    def const(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=mem)

    p = params
    in_specs = [
        pl.BlockSpec((R, C), lambda i: (i, 0), memory_space=mem),
        pl.BlockSpec((R, 1), lambda i: (i, 0), memory_space=mem),
        const((heads, PAD_T, PAD_T)),
        (pl.BlockSpec((G, PAD_T, PAD_T), lambda i: (i, 0, 0),
                      memory_space=mem)
         if with_mask else const((G, 1, 1))),
        const((C,)), const((C,)),
        const((C, 3 * C)), const((3 * C,)),
        const((C, C)), const((C,)),
        const((C,)), const((C,)),
        const((C, 4 * C)), const((4 * C,)),
        const((4 * C, C)), const((C,)),
    ]
    out = pl.pallas_call(
        partial(_swin_block_kernel, heads=heads, head_dim=D,
                windows=G, eps=eps, with_mask=with_mask),
        out_shape=jax.ShapeDtypeStruct((nWp * PAD_T, C), x_win.dtype),
        grid=(nWp // G,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((R, C), lambda i: (i, 0),
                               memory_space=mem),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        x, tv, bias_p, mask_p,
        p["ln1"]["scale"], p["ln1"]["bias"],
        p["qkv"]["kernel"], p["qkv"]["bias"],
        p["proj"]["kernel"], p["proj"]["bias"],
        p["ln2"]["scale"], p["ln2"]["bias"],
        p["fc1"]["kernel"], p["fc1"]["bias"],
        p["fc2"]["kernel"], p["fc2"]["bias"],
    )
    out = out.reshape(nWp, PAD_T, C)[:nW, :N]
    return out


# ---------------------------------------------------------------------
# Pure-function Swin backbone forward over a SwinBackbone param tree,
# with every block running as ONE fused kernel. Mirrors swin.py
# SwinBackbone.__call__ exactly (parity-tested); used standalone for
# measurement and by the detector when the fused path wins.


def _ln_np(x, prm, eps):
    return _ln(x, jnp.asarray(prm["scale"]), jnp.asarray(prm["bias"]),
               eps)


def _window_partition(x, w):
    B, H, W, C = x.shape
    x = x.reshape(B, H // w, w, W // w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, C)


def _window_merge(x, w, B, H, W):
    C = x.shape[-1]
    x = x.reshape(B, H // w, W // w, w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


def swin_backbone_apply_fused(params, x, cfg, block_windows: int = 8,
                              interpret: bool = False):
    """params: SwinBackbone param tree (variables['params'] or the
    detector's params['backbone']); x: (B, H, W, 3) normalized images.
    Returns the 4 stage feature maps like SwinBackbone.__call__."""
    from macaque_tpu.nn.swin import _rel_pos_index, _shift_mask

    c = cfg
    p = c.patch_size
    dt = c.compute_dtype
    B, H, W, Cin = x.shape

    pe = params["patch_embed"]
    patches = x.reshape(B, H // p, p, W // p, p, Cin)
    patches = patches.transpose(0, 1, 3, 2, 4, 5)
    patches = patches.reshape(B, H // p, W // p, p * p * Cin)
    w_pe = jnp.asarray(pe["kernel"]).reshape(p * p * Cin, c.embed_dim)
    x = patches.astype(dt) @ w_pe.astype(dt) \
        + jnp.asarray(pe["bias"]).astype(dt)
    x = _ln_np(x, params["patch_norm"], c.ln_eps)

    idx = _rel_pos_index(c.window)
    onehot = jnp.asarray(
        np.eye((2 * c.window - 1) ** 2, dtype=np.float32)[idx.reshape(-1)]
    )

    outs = []
    for stage, depth in enumerate(c.depths):
        heads = c.num_heads[stage]
        for b in range(depth):
            shift = 0 if b % 2 == 0 else c.window // 2
            blk = params[f"stage{stage}_block{b}"]
            Bq, Hq, Wq, C = x.shape
            w = c.window
            pad_h = (w - Hq % w) % w
            pad_w = (w - Wq % w) % w
            xp = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            valid = jnp.pad(
                jnp.ones((1, Hq, Wq, 1), jnp.float32),
                ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            Hp, Wp = Hq + pad_h, Wq + pad_w
            mask = None
            if shift > 0:
                xp = jnp.roll(xp, (-shift, -shift), axis=(1, 2))
                valid = jnp.roll(valid, (-shift, -shift), axis=(1, 2))
                mask_w = jnp.asarray(_shift_mask(Hp, Wp, w, shift))
                mask = jnp.tile(mask_w, (Bq, 1, 1))

            xw = _window_partition(xp, w)            # (nW, 49, C)
            tok_valid = _window_partition(
                jnp.tile(valid, (Bq, 1, 1, 1)), w)[..., 0] > 0

            table = jnp.asarray(blk["attn"]["rel_bias"])
            bias = (onehot @ table).reshape(w * w, w * w, heads)
            bias_hnm = jnp.transpose(bias, (2, 0, 1))

            kparams = {
                "ln1": blk["ln1"], "ln2": blk["ln2"],
                "qkv": blk["attn"]["qkv"],
                "proj": blk["attn"]["proj"],
                "fc1": blk["fc1"], "fc2": blk["fc2"],
            }
            kparams = jax.tree.map(
                lambda a: jnp.asarray(a).astype(
                    dt if jnp.asarray(a).ndim >= 1 else a.dtype),
                kparams)
            # LN params stay f32 for exact statistics
            for lnk in ("ln1", "ln2"):
                kparams[lnk] = {
                    k2: jnp.asarray(blk[lnk][k2]).astype(jnp.float32)
                    for k2 in ("scale", "bias")
                }
            yw = fused_swin_block(
                xw, tok_valid, kparams, bias_hnm, mask, heads,
                block_windows=block_windows, eps=c.ln_eps,
                interpret=interpret)
            y = _window_merge(yw, w, Bq, Hp, Wp)
            if shift > 0:
                y = jnp.roll(y, (shift, shift), axis=(1, 2))
            x = y[:, :Hq, :Wq]

        x_out = _ln_np(x, params[f"out_norm{stage}"], c.ln_eps)
        outs.append(x_out)
        if stage < len(c.depths) - 1:
            mg = params[f"merge{stage}"]
            Bq, Hq, Wq, C = x.shape
            xp = jnp.pad(x, ((0, 0), (0, Hq % 2), (0, Wq % 2), (0, 0)))
            Hp, Wp = xp.shape[1], xp.shape[2]
            xp = xp.reshape(Bq, Hp // 2, 2, Wp // 2, 2, C)
            xp = xp.transpose(0, 1, 3, 4, 2, 5)
            xp = xp.reshape(Bq, Hp // 2, Wp // 2, 4 * C)
            xp = _ln_np(xp, mg["ln"], c.ln_eps)
            x = xp @ jnp.asarray(mg["reduction"]["kernel"]).astype(dt)
    return outs
