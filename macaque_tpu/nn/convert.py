"""Convert released OpenMMLab .pth checkpoints into this framework's Flax
parameter trees.

Handles the three model families the reference ships
(step1_proc2d.py:52-65): mmpose ViTPose (pose.pth), mmdet Swin Mask R-CNN
(detection.pth), mmpretrain ResNet-152 (id_*.pth). Key-name conventions
follow the released configs; layout conversions:
  * Linear (out,in) -> Dense kernel (in,out)
  * Conv2d (out,in,kh,kw) -> Conv kernel (kh,kw,in,out)
  * ConvTranspose2d (in,out,kh,kw) -> ConvTranspose kernel flipped
    spatially, (kh,kw,in,out) — verified numerically in tests
  * BatchNorm -> {scale,bias} params + {mean,var} batch_stats
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def _t_linear(w):
    return np.ascontiguousarray(np.asarray(w).T)


def _t_conv(w):
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _t_deconv(w):
    # torch ConvTranspose2d weight (in, out, kh, kw) -> flax ConvTranspose
    # kernel (kh, kw, in, out), spatially flipped (lax.conv_transpose with
    # transpose_kernel=False correlates, torch convolves)
    w = np.asarray(w)[:, :, ::-1, ::-1]
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))


class _TrackedDict(dict):
    """Records accessed keys so converters can report coverage."""

    def __init__(self, base):
        super().__init__(base)
        self.accessed: set = set()

    def __getitem__(self, key):
        self.accessed.add(key)
        return super().__getitem__(key)

    def __contains__(self, key):
        return super().__contains__(key)


# checkpoint entries that are legitimately unconsumed (recomputed buffers,
# training-only state, heads the bbox-only config disables)
_IGNORABLE_PATTERNS = (
    "relative_position_index", "num_batches_tracked", "attn_mask",
    "mask_head", "ema_", "data_preprocessor",
)


def _report_coverage(sd, name: str):
    if not isinstance(sd, _TrackedDict):
        return
    unused = [
        k for k in sd.keys()
        if k not in sd.accessed
        and not any(p in k for p in _IGNORABLE_PATTERNS)
    ]
    if unused:
        print(f"[convert:{name}] warning: {len(unused)} checkpoint keys "
              f"not consumed, e.g. {unused[:5]} — check naming drift")


def _np(sd, key):
    try:
        v = sd[key]
    except KeyError:
        close = [k for k in sd if key.rsplit(".", 1)[0] in k][:5]
        raise KeyError(
            f"checkpoint key {key!r} not found; similar keys: {close}"
        ) from None
    try:  # torch tensor
        v = v.detach().cpu().numpy()
    except AttributeError:
        v = np.asarray(v)
    return v


def _bn(sd, prefix):
    params = {"scale": _np(sd, f"{prefix}.weight"), "bias": _np(sd, f"{prefix}.bias")}
    stats = {"mean": _np(sd, f"{prefix}.running_mean"),
             "var": _np(sd, f"{prefix}.running_var")}
    return params, stats


def _ln(sd, prefix):
    return {"scale": _np(sd, f"{prefix}.weight"), "bias": _np(sd, f"{prefix}.bias")}


def _dense(sd, prefix):
    out = {"kernel": _t_linear(_np(sd, f"{prefix}.weight"))}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd, f"{prefix}.bias")
    return out


def _conv(sd, prefix):
    out = {"kernel": _t_conv(_np(sd, f"{prefix}.weight"))}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd, f"{prefix}.bias")
    return out


# ------------------------------------------------------------------ ViTPose

def convert_vitpose(state_dict: Mapping, depth: int = 32):
    """mmpose TopdownPoseEstimator (ViT backbone + HeatmapHead) ->
    {'params': ..., 'batch_stats': ...} for macaque_tpu.nn.vit.ViTPose."""
    sd = _TrackedDict(state_dict)
    params: dict = {"backbone": {}, "head": {}}
    stats: dict = {"head": {}}

    bb = params["backbone"]
    bb["patch_embed"] = _conv(sd, "backbone.patch_embed.projection")
    pos = _np(sd, "backbone.pos_embed")
    if pos.shape[1] % 2 == 1:  # includes a cls-token slot; drop it
        pos = pos[:, 1:]
    bb["pos_embed"] = pos
    for i in range(depth):
        p = f"backbone.layers.{i}"
        bb[f"block{i}"] = {
            "ln1": _ln(sd, f"{p}.ln1"),
            "ln2": _ln(sd, f"{p}.ln2"),
            "attn": {
                "qkv": _dense(sd, f"{p}.attn.qkv"),
                "proj": _dense(sd, f"{p}.attn.proj"),
            },
            "fc1": _dense(sd, f"{p}.ffn.layers.0.0"),
            "fc2": _dense(sd, f"{p}.ffn.layers.1"),
        }
    bb["ln_final"] = _ln(sd, "backbone.ln1")

    hd = params["head"]
    hs = stats["head"]
    # mmpose HeatmapHead deconv_layers: [deconv, BN, ReLU] * 2
    for j, (wi, bi) in enumerate([(0, 1), (3, 4)]):
        hd[f"deconv{j}"] = {
            "kernel": _t_deconv(_np(sd, f"head.deconv_layers.{wi}.weight"))
        }
        bn_p, bn_s = _bn(sd, f"head.deconv_layers.{bi}")
        hd[f"bn{j}"] = bn_p
        hs[f"bn{j}"] = bn_s
    hd["final"] = _conv(sd, "head.final_layer")
    _report_coverage(sd, "vitpose")
    return {"params": params, "batch_stats": stats}


# ------------------------------------------------------------------ ResNet

def convert_resnet(state_dict: Mapping, stage_blocks=(3, 8, 36, 3)):
    """mmpretrain ImageClassifier(ResNet) -> params/batch_stats for
    macaque_tpu.nn.resnet.ResNetClassifier."""
    sd = _TrackedDict(state_dict)
    params: dict = {}
    stats: dict = {}
    params["stem_conv"] = _conv(sd, "backbone.conv1")
    params["stem_bn"], stats["stem_bn"] = _bn(sd, "backbone.bn1")
    for s, blocks in enumerate(stage_blocks):
        for b in range(blocks):
            p = f"backbone.layer{s + 1}.{b}"
            name = f"layer{s + 1}_{b}"
            layer: dict = {}
            lstat: dict = {}
            for c in (1, 2, 3):
                layer[f"conv{c}"] = _conv(sd, f"{p}.conv{c}")
                layer[f"bn{c}"], lstat[f"bn{c}"] = _bn(sd, f"{p}.bn{c}")
            if f"{p}.downsample.0.weight" in sd:
                layer["ds_conv"] = _conv(sd, f"{p}.downsample.0")
                layer["ds_bn"], lstat["ds_bn"] = _bn(sd, f"{p}.downsample.1")
            params[name] = layer
            stats[name] = lstat
    params["fc"] = _dense(sd, "head.fc")
    _report_coverage(sd, "resnet")
    return {"params": params, "batch_stats": stats}


# ----------------------------------------------------------------- Swin det

def convert_swin_backbone(state_dict: Mapping, depths=(2, 2, 18, 2)) -> dict:
    """mmdet SwinTransformer backbone keys (prefix 'backbone.') ->
    macaque_tpu.nn.swin.SwinBackbone params."""
    sd = state_dict
    bb: dict = {}
    bb["patch_embed"] = _conv(sd, "backbone.patch_embed.projection")
    bb["patch_norm"] = _ln(sd, "backbone.patch_embed.norm")
    for s, depth in enumerate(depths):
        for b in range(depth):
            p = f"backbone.stages.{s}.blocks.{b}"
            bb[f"stage{s}_block{b}"] = {
                "ln1": _ln(sd, f"{p}.norm1"),
                "ln2": _ln(sd, f"{p}.norm2"),
                "attn": {
                    "qkv": _dense(sd, f"{p}.attn.w_msa.qkv"),
                    "proj": _dense(sd, f"{p}.attn.w_msa.proj"),
                    "rel_bias": _np(
                        sd, f"{p}.attn.w_msa.relative_position_bias_table"
                    ),
                },
                "fc1": _dense(sd, f"{p}.ffn.layers.0.0"),
                "fc2": _dense(sd, f"{p}.ffn.layers.1"),
            }
        if s < len(depths) - 1:
            bb[f"merge{s}"] = {
                "ln": _ln(sd, f"backbone.stages.{s}.downsample.norm"),
                "reduction": _dense(
                    sd, f"backbone.stages.{s}.downsample.reduction"
                ),
            }
        bb[f"out_norm{s}"] = _ln(sd, f"backbone.norm{s}")
    return bb


def convert_swin_maskrcnn(state_dict: Mapping, depths=(2, 2, 18, 2)):
    """mmdet Swin Mask R-CNN (bbox-only) -> params for
    macaque_tpu.nn.detector.SwinMaskRCNN."""
    sd = _TrackedDict(state_dict)
    bb = convert_swin_backbone(sd, depths)

    neck: dict = {}
    for i in range(4):
        neck[f"lateral{i}"] = _conv(sd, f"neck.lateral_convs.{i}.conv")
        neck[f"fpn_conv{i}"] = _conv(sd, f"neck.fpn_convs.{i}.conv")

    rpn = {
        "conv": _conv(sd, "rpn_head.rpn_conv"),
        "cls": _conv(sd, "rpn_head.rpn_cls"),
        "reg": _conv(sd, "rpn_head.rpn_reg"),
    }
    # fc1 consumes flattened RoI features: torch flattens (C,7,7)
    # channel-first, flax flattens (7,7,C) channel-last -> permute input dim
    fc1_w = _np(sd, "roi_head.bbox_head.shared_fcs.0.weight")  # (1024, C*49)
    C = 256
    fc1_w = fc1_w.reshape(1024, C, 7, 7).transpose(0, 2, 3, 1).reshape(1024, -1)
    bbox_head = {
        "fc1": {
            "kernel": _t_linear(fc1_w),
            "bias": _np(sd, "roi_head.bbox_head.shared_fcs.0.bias"),
        },
        "fc2": _dense(sd, "roi_head.bbox_head.shared_fcs.1"),
        "cls": _dense(sd, "roi_head.bbox_head.fc_cls"),
        "reg": _dense(sd, "roi_head.bbox_head.fc_reg"),
    }
    _report_coverage(sd, "swin_maskrcnn")
    return {
        "params": {
            "backbone": bb,
            "fpn": neck,
            "rpn": rpn,
            "bbox_head": bbox_head,
        }
    }


def load_torch_checkpoint(path: str) -> dict:
    """Load a .pth checkpoint (handles mmengine's {'state_dict': ...}
    wrapper) into a flat name->ndarray dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}
