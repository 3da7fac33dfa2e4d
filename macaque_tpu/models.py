"""Alias namespace: model families (see macaque_tpu.nn for definitions)."""

from macaque_tpu.nn import (  # noqa: F401
    ViTPose, VitPoseConfig,
    SwinMaskRCNN, DetectorConfig,
    SwinBackbone, SwinConfig,
    ResNetClassifier, ResNetConfig,
)
