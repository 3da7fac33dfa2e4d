"""Swin backbone torch-parity test through the converter path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
tn = torch.nn


def build_torch_swin(embed=16, depths=(2, 2), heads=(2, 4), window=4):
    """Minimal Swin backbone in torch with mmdet parameter naming."""

    def rel_index(w):
        coords = torch.stack(
            torch.meshgrid(torch.arange(w), torch.arange(w), indexing="ij")
        ).flatten(1)
        rel = coords[:, :, None] - coords[:, None, :]
        rel = rel.permute(1, 2, 0) + (w - 1)
        return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).long()

    class WMSA(tn.Module):
        def __init__(self, dim, nh):
            super().__init__()
            self.qkv = tn.Linear(dim, 3 * dim)
            self.proj = tn.Linear(dim, dim)
            self.relative_position_bias_table = tn.Parameter(
                torch.randn((2 * window - 1) ** 2, nh) * 0.02
            )
            self.nh = nh

        def forward(self, x, mask=None):
            B_, N, C = x.shape
            qkv = self.qkv(x).reshape(B_, N, 3, self.nh, C // self.nh)
            qkv = qkv.permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q @ k.transpose(-2, -1)) * (C // self.nh) ** -0.5
            bias = self.relative_position_bias_table[rel_index(window).view(-1)]
            bias = bias.view(N, N, self.nh).permute(2, 0, 1)
            attn = attn + bias[None]
            if mask is not None:
                nW = mask.shape[0]
                attn = attn.view(B_ // nW, nW, self.nh, N, N) + mask[None, :, None]
                attn = attn.view(B_, self.nh, N, N)
            attn = attn.softmax(-1)
            out = (attn @ v).transpose(1, 2).reshape(B_, N, C)
            return self.proj(out)

    class Attn(tn.Module):
        def __init__(self, dim, nh):
            super().__init__()
            self.w_msa = WMSA(dim, nh)

        def forward(self, x, mask=None):
            return self.w_msa(x, mask)

    class FFN(tn.Module):
        def __init__(self, dim):
            super().__init__()
            self.layers = tn.ModuleList(
                [tn.Sequential(tn.Linear(dim, 4 * dim)), tn.Linear(4 * dim, dim)]
            )

        def forward(self, x):
            return self.layers[1](tn.functional.gelu(self.layers[0](x)))

    class Block(tn.Module):
        def __init__(self, dim, nh, shift):
            super().__init__()
            self.norm1 = tn.LayerNorm(dim, eps=1e-5)
            self.attn = Attn(dim, nh)
            self.norm2 = tn.LayerNorm(dim, eps=1e-5)
            self.ffn = FFN(dim)
            self.shift = shift

        def forward(self, x, H, W):
            B, L, C = x.shape
            sc = x
            x = self.norm1(x).view(B, H, W, C)
            w = window
            pad_h = (w - H % w) % w
            pad_w = (w - W % w) % w
            x = tn.functional.pad(x, (0, 0, 0, pad_w, 0, pad_h))
            Hp, Wp = H + pad_h, W + pad_w
            mask = None
            if self.shift:
                x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
                img = torch.zeros(Hp, Wp)
                cnt = 0
                for hs in (slice(0, -w), slice(-w, -self.shift),
                           slice(-self.shift, None)):
                    for ws in (slice(0, -w), slice(-w, -self.shift),
                               slice(-self.shift, None)):
                        img[hs, ws] = cnt
                        cnt += 1
                mw = img.view(Hp // w, w, Wp // w, w).permute(0, 2, 1, 3)
                mw = mw.reshape(-1, w * w)
                mask = (mw[:, :, None] - mw[:, None, :])
                mask = torch.where(mask != 0, torch.tensor(-100.0),
                                   torch.tensor(0.0))
            xw = x.view(B, Hp // w, w, Wp // w, w, C).permute(0, 1, 3, 2, 4, 5)
            xw = xw.reshape(-1, w * w, C)
            xw = self.attn(xw, mask)
            x = xw.view(B, Hp // w, Wp // w, w, w, C).permute(0, 1, 3, 2, 4, 5)
            x = x.reshape(B, Hp, Wp, C)
            if self.shift:
                x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
            x = x[:, :H, :W].reshape(B, L, C)
            x = sc + x
            return x + self.ffn(self.norm2(x))

    class Downsample(tn.Module):
        def __init__(self, dim):
            super().__init__()
            self.norm = tn.LayerNorm(4 * dim, eps=1e-5)
            self.reduction = tn.Linear(4 * dim, 2 * dim, bias=False)

        def forward(self, x, H, W):
            B, L, C = x.shape
            x = x.view(B, H, W, C)
            x = tn.functional.pad(x, (0, 0, 0, W % 2, 0, H % 2))
            x0 = x[:, 0::2, 0::2]
            x1 = x[:, 1::2, 0::2]
            x2 = x[:, 0::2, 1::2]
            x3 = x[:, 1::2, 1::2]
            x = torch.cat([x0, x1, x2, x3], -1).view(B, -1, 4 * C)
            return self.reduction(self.norm(x))

    class Stage(tn.Module):
        def __init__(self, dim, depth, nh, last):
            super().__init__()
            self.blocks = tn.ModuleList(
                [Block(dim, nh, 0 if b % 2 == 0 else window // 2)
                 for b in range(depth)]
            )
            self.downsample = None if last else Downsample(dim)

    class PatchEmbed(tn.Module):
        def __init__(self):
            super().__init__()
            self.projection = tn.Conv2d(3, embed, 4, 4)
            self.norm = tn.LayerNorm(embed, eps=1e-5)

    class Backbone(tn.Module):
        def __init__(self):
            super().__init__()
            self.patch_embed = PatchEmbed()
            self.stages = tn.ModuleList(
                [Stage(embed * 2 ** s, depths[s], heads[s],
                       s == len(depths) - 1) for s in range(len(depths))]
            )
            for s in range(len(depths)):
                setattr(self, f"norm{s}",
                        tn.LayerNorm(embed * 2 ** s, eps=1e-5))

        def forward(self, x):
            x = self.patch_embed.projection(x)
            B, C, H, W = x.shape
            x = x.flatten(2).transpose(1, 2)
            x = self.patch_embed.norm(x)
            outs = []
            for s, stage in enumerate(self.stages):
                for blk in stage.blocks:
                    x = blk(x, H, W)
                out = getattr(self, f"norm{s}")(x)
                outs.append(out.view(B, H, W, -1))
                if stage.downsample is not None:
                    x = stage.downsample(x, H, W)
                    H, W = (H + 1) // 2, (W + 1) // 2
            return outs

    class Model(tn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = Backbone()

    return Model().eval()


def test_swin_backbone_matches_torch():
    from macaque_tpu.nn.swin import SwinBackbone, SwinConfig
    from macaque_tpu.nn.convert import convert_swin_backbone

    torch.manual_seed(2)
    tm = build_torch_swin()
    sd = tm.state_dict()

    cfg = SwinConfig(embed_dim=16, depths=(2, 2), num_heads=(2, 4), window=4)
    model = SwinBackbone(cfg)
    params = jax.tree.map(jnp.asarray, convert_swin_backbone(sd, (2, 2)))

    rng = np.random.default_rng(7)
    x = rng.normal(size=(1, 32, 24, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm.backbone(torch.from_numpy(x).permute(0, 3, 1, 2))
    outs = model.apply({"params": params}, jnp.asarray(x))
    for got, w in zip(outs, want):
        np.testing.assert_allclose(
            np.asarray(got), w.numpy(), atol=3e-5
        )


def test_swin_pallas_window_attention_matches_xla():
    """Swin forward with the packed fused window-attention kernel
    (interpreter mode) must match the XLA einsum path, incl. shifted
    blocks with masks."""
    import numpy as np
    from functools import partial as _partial
    from macaque_tpu.nn.swin import SwinBackbone, SwinConfig
    from macaque_tpu.nn import pallas_attention as pa

    cfg_x = SwinConfig(embed_dim=16, depths=(2, 2), num_heads=(2, 4),
                       window=4)
    cfg_p = SwinConfig(embed_dim=16, depths=(2, 2), num_heads=(2, 4),
                       window=4, use_pallas_attention=True)
    mx = SwinBackbone(cfg_x)
    mp = SwinBackbone(cfg_p)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(1, 32, 24, 3)).astype(np.float32))
    variables = mx.init(jax.random.PRNGKey(0), x)

    orig = pa.fused_window_attention_blocked
    pa.fused_window_attention_blocked = _partial(orig, interpret=True)
    try:
        got = mp.apply(variables, x)
    finally:
        pa.fused_window_attention_blocked = orig
    want = mx.apply(variables, x)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=3e-5)
