"""ResNet50-UNet segmentation baseline.

Equivalent of the reference's alternative baseline path
(Segmentation/train.py:139-180: torchvision resnet50 + smp.Unet) — a UNet
decoder with skip connections over the ResNet-50 backbone taps. Used for
baseline comparisons, not for ECAMP-pretrained results.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.image_ops import upsample_nearest
from .resnet import _Bottleneck


class _DecoderBlock(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        x = upsample_nearest(x, 2)
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        for i in range(2):
            x = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name=f"conv{i + 1}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"bn{i + 1}")(x)
            x = jax.nn.relu(x)
        return x


class ResNetUNet(nn.Module):
    """UNet over ResNet-50: encoder taps c1(56^2x256 via layer1 is inside
    backbone's outs[0]... we re-tap), decoder (256,128,64,32,16)."""

    out_channels: int = 1
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # stem
        s0 = x  # full res
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(h)
        s1 = jax.nn.relu(h)  # /2, 64
        h = nn.max_pool(s1, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        planes = (64, 128, 256, 512)
        layers = (3, 4, 6, 3)
        skips = []
        for li, (n_blocks, p) in enumerate(zip(layers, planes)):
            stride = 1 if li == 0 else 2
            for bi in range(n_blocks):
                h = _Bottleneck(p, stride=stride if bi == 0 else 1,
                                has_downsample=(bi == 0), dtype=self.dtype,
                                name=f"layer{li + 1}_{bi}")(h, train)
            skips.append(h)
        c1, c2, c3, c4 = skips  # /4x256, /8x512, /16x1024, /32x2048
        d = c4
        for i, (ch, skip) in enumerate(zip(self.decoder_channels,
                                           [c3, c2, c1, s1, None])):
            d = _DecoderBlock(ch, dtype=self.dtype,
                              name=f"decoder_{i}")(d, skip, train)
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       dtype=jnp.float32, name="seg_head")(
                           d.astype(jnp.float32))
