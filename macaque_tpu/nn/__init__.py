"""Flax/JAX neural networks: ViTPose-huge (2D pose), Swin-S Mask R-CNN
(bbox-only detection), ResNet-152 (collar-ID classification), plus fused
preprocessing and heatmap decoding.

TPU-native replacements for the reference's OpenMMLab/PyTorch models
(reference: model/pose/td-hm_ViTPose-huge_...py, model/detection/
SWIN-Mask_R-CNN_bbox_only.py, model/id/sn_resnet152_*.py; run at
step1_proc2d.py:95-122). Weight converters map the released .pth
checkpoints into these modules.
"""

from macaque_tpu.nn.vit import ViTPose, VitPoseConfig
from macaque_tpu.nn.heatmap import udp_decode, flip_heatmaps, MACAQUE_FLIP_PAIRS
from macaque_tpu.nn.resnet import ResNetClassifier, ResNetConfig
from macaque_tpu.nn.swin import SwinBackbone, SwinConfig
from macaque_tpu.nn.detector import SwinMaskRCNN, DetectorConfig

__all__ = [
    "ViTPose",
    "VitPoseConfig",
    "udp_decode",
    "flip_heatmaps",
    "MACAQUE_FLIP_PAIRS",
    "ResNetClassifier",
    "ResNetConfig",
    "SwinBackbone",
    "SwinConfig",
    "SwinMaskRCNN",
    "DetectorConfig",
]
