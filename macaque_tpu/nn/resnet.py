"""ResNet classifier (collar-colour ID) in Flax.

Matches the reference's mmpretrain ImageClassifier with ResNet-152
backbone, GAP neck and 6-way linear head
(model/id/sn_resnet152_*.py: depth 152, num_classes 6, classes
['b','d','g','r','unknown','w']). Bottleneck is the standard pytorch-style
(stride on the 3x3 conv, as mmpretrain/torchvision do).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp


@dataclass(frozen=True)
class ResNetConfig:
    depth: int = 152
    num_classes: int = 6
    compute_dtype: Any = jnp.float32

    @property
    def stage_blocks(self) -> Tuple[int, ...]:
        return {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}[self.depth]


class Bottleneck(nn.Module):
    cfg: ResNetConfig
    channels: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name=name)
        identity = x
        out = nn.Conv(self.channels, (1, 1), use_bias=False,
                      dtype=c.compute_dtype, name="conv1")(x)
        out = nn.relu(norm("bn1")(out))
        out = nn.Conv(self.channels, (3, 3), strides=(self.stride, self.stride),
                      padding=[(1, 1), (1, 1)], use_bias=False,
                      dtype=c.compute_dtype, name="conv2")(out)
        out = nn.relu(norm("bn2")(out))
        out = nn.Conv(self.channels * 4, (1, 1), use_bias=False,
                      dtype=c.compute_dtype, name="conv3")(out)
        out = norm("bn3")(out)
        if self.downsample:
            identity = nn.Conv(self.channels * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=c.compute_dtype,
                               name="ds_conv")(x)
            identity = norm("ds_bn")(identity)
        return nn.relu(out + identity)


class ResNetClassifier(nn.Module):
    cfg: ResNetConfig = field(default_factory=ResNetConfig)

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, 224, 224, 3) normalized -> logits (B, num_classes)."""
        c = self.cfg
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=c.compute_dtype, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        channels = 64
        for stage, blocks in enumerate(c.stage_blocks):
            for b in range(blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                x = Bottleneck(
                    c, channels, stride=stride, downsample=(b == 0),
                    name=f"layer{stage + 1}_{b}",
                )(x, train=train)
            channels *= 2

        x = jnp.mean(x, axis=(1, 2))  # GAP neck
        return nn.Dense(c.num_classes, dtype=jnp.float32, name="fc")(x)
