"""ResNet-50 backbone exposing layer2/3/4 feature maps.

Baseline detection path of the reference
(Detection/detector_backbone_resnet.py:16-53: torchvision resnet50 with
multi-scale taps {28^2x512, 14^2x1024, 7^2x2048} at 224 input). NHWC,
torchvision V1.5 semantics (stride on the 3x3), importable from
torchvision state dicts via the generic key mapping (layerN.M.convK/bnK,
downsample.0/1).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class _Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name=name)

        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = jax.nn.relu(bn("bn1")(out))
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=1, use_bias=False, dtype=self.dtype,
                      name="conv2")(out)
        out = jax.nn.relu(bn("bn2")(out))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = bn("bn3")(out)
        if self.has_downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype,
                                    name="downsample_bn")(identity)
        return jax.nn.relu(out + identity)


class ResNet50Backbone(nn.Module):
    """Returns (c2 28^2x512, c3 14^2x1024, c4 7^2x2048) at 224 input —
    drop-in alternative to the ViT det backbone for the YOLO head."""

    dtype: jnp.dtype = jnp.float32
    layers: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = jax.nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        planes = (64, 128, 256, 512)
        outs = []
        for li, (n_blocks, p) in enumerate(zip(self.layers, planes)):
            stride = 1 if li == 0 else 2
            for bi in range(n_blocks):
                x = _Bottleneck(p, stride=stride if bi == 0 else 1,
                                has_downsample=(bi == 0), dtype=self.dtype,
                                name=f"layer{li + 1}_{bi}")(x, train)
            outs.append(x)
        # layer2, layer3, layer4 taps (detector_backbone_resnet.py:41-53)
        return outs[1], outs[2], outs[3]
