"""Detection models: ViT backbone + multi-scale neck + YOLOv3 head.

Reference: Detection/detector_backbone_vit.py (ViT det_head + Bottleneck
neck producing {28^2x512, 14^2x1024, 7^2x2048}) and detector_model.py
(YOLOv3 ModelMain with COCO anchors scaled by 224/416, classes=1).
All convs NHWC.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.config import ViTConfig
from ..ops.image_ops import upsample_align_corners, upsample_nearest
from .layers import Dense
from .vit import VisionTransformer

# COCO anchors * 224/416 (detector_model.py:14-18); scale order matches the
# head outputs (out0 = 7x7 coarse, out1 = 14x14, out2 = 28x28)
YOLO_ANCHORS = tuple(
    tuple((aw * 224 / 416, ah * 224 / 416) for aw, ah in scale)
    for scale in (
        ((116, 90), (156, 198), (373, 326)),
        ((30, 61), (62, 45), (59, 119)),
        ((10, 13), (16, 30), (33, 23)),
    )
)


class Bottleneck(nn.Module):
    """ResNet-V1.5 bottleneck with parametric expansion
    (detector_backbone_vit.py:41-99). inplanes == planes * expansion here,
    so no downsample branch is ever created."""

    planes: int
    expansion: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name=name)

        width = self.planes
        out = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = jax.nn.relu(bn("bn1")(out))
        out = nn.Conv(width, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = jax.nn.relu(bn("bn2")(out))
        out = nn.Conv(width * self.expansion, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = bn("bn3")(out)
        return jax.nn.relu(out + x)


class DetEncoder(nn.Module):
    """ViT trunk + det_head projection to a (B, 14, 14, 768) map
    (detector_backbone_vit.py:102-138)."""

    cfg: ViTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 stop_trunk_grad: bool = False):
        c = self.cfg
        b, h_img = x.shape[0], x.shape[1]
        tokens = VisionTransformer(c, dtype=self.dtype, name="trunk")(
            x, deterministic)
        if stop_trunk_grad:
            # frozen-encoder training (Detection/train.py:169-174): the
            # trunk's grads are optimizer-masked to zero, so skip the dead
            # backward (the reference's requires_grad=False cost semantics);
            # det_head stays trainable. Numerically identical updates.
            tokens = jax.lax.stop_gradient(tokens)
        tokens = tokens[:, 1:, :]
        tokens = Dense(c.embed_dim, dtype=self.dtype, name="det_head")(tokens)
        grid = h_img // c.patch_size
        return tokens.reshape(b, grid, grid, c.embed_dim)


class DetectionLayers(nn.Module):
    """Multi-scale neck (detector_backbone_vit.py:141-188).

    Returns (x2 28^2x512, x1 14^2x1024, x0 7^2x2048)."""

    channels: Sequence[int] = (512, 1024, 2048)
    expansion: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = self.channels
        out1 = nn.Conv(ch[1], (1, 1), dtype=self.dtype, name="traspose")(x)
        out1 = Bottleneck(ch[1] // self.expansion, self.expansion,
                          dtype=self.dtype, name="layer1")(out1, train)

        out2 = nn.Conv(ch[0], (1, 1), dtype=self.dtype, name="transpose1")(x)
        out2 = upsample_align_corners(out2, 2)
        out2 = Bottleneck(ch[0] // self.expansion, self.expansion,
                          dtype=self.dtype, name="layer2")(out2, train)

        out3 = nn.Conv(ch[2], (1, 1), strides=(2, 2), use_bias=False,
                       dtype=self.dtype, name="downsample")(x)
        out3 = Bottleneck(ch[2] // self.expansion, self.expansion,
                          dtype=self.dtype, name="layer3")(out3, train)
        return out2, out1, out3


class ViTDetector(nn.Module):
    """Backbone wrapper (detector_backbone_vit.py:191-221)."""

    cfg: ViTConfig
    expansion: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, deterministic: bool = True,
                 stop_trunk_grad: bool = False):
        feat = DetEncoder(self.cfg, dtype=self.dtype, name="encoder")(
            x, deterministic, stop_trunk_grad)
        return DetectionLayers(expansion=self.expansion, dtype=self.dtype,
                               name="layers")(feat, train)


class _CBL(nn.Module):
    """conv + BN + LeakyReLU(0.1) (detector_model.py:42-51)."""

    filters: int
    kernel: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.filters, (self.kernel, self.kernel), padding=pad,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.leaky_relu(x, negative_slope=0.1)


class _Embedding(nn.Module):
    """6-cbl tower + 1x1 conv_out; branch output after the 5th cbl
    (detector_model.py:53-71)."""

    filters: Tuple[int, int]
    out_filters: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f0, f1 = self.filters
        plan = [(f0, 1), (f1, 3), (f0, 1), (f1, 3), (f0, 1), (f1, 3)]
        branch = None
        for i, (f, k) in enumerate(plan):
            x = _CBL(f, k, dtype=self.dtype, name=f"cbl_{i}")(x, train)
            if i == 4:
                branch = x
        out = nn.Conv(self.out_filters, (1, 1), dtype=jnp.float32,
                      name="conv_out")(x.astype(jnp.float32))
        return out, branch


class YoloV3Head(nn.Module):
    """ModelMain top-down head (detector_model.py:9-95)."""

    num_classes: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x2, x1, x0, train: bool = False):
        n_out = 3 * (5 + self.num_classes)
        out0, b0 = _Embedding((512, 1024), n_out, dtype=self.dtype,
                              name="embedding0")(x0, train)
        y = _CBL(256, 1, dtype=self.dtype, name="embedding1_cbl")(b0, train)
        y = upsample_nearest(y, 2)
        y = jnp.concatenate([y, x1], axis=-1)
        out1, b1 = _Embedding((256, 512), n_out, dtype=self.dtype,
                              name="embedding1")(y, train)
        z = _CBL(128, 1, dtype=self.dtype, name="embedding2_cbl")(b1, train)
        z = upsample_nearest(z, 2)
        z = jnp.concatenate([z, x2], axis=-1)
        out2, _ = _Embedding((128, 256), n_out, dtype=self.dtype,
                             name="embedding2")(z, train)
        return out0, out1, out2


class DetectionModel(nn.Module):
    """Full detector: ViT (default) or ResNet-50 backbone + neck + YOLOv3
    head (reference baseline path, detector_backbone_resnet.py). Outputs
    NCHW maps ((B, 18, 7, 7), (B, 18, 14, 14), (B, 18, 28, 28)) to match
    the reference loss/decode layout."""

    cfg: ViTConfig
    num_classes: int = 1
    expansion: int = 4
    backbone: str = "vit"  # vit | resnet50
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, deterministic: bool = True,
                 stop_trunk_grad: bool = False):
        if self.backbone == "resnet50":
            from .resnet import ResNet50Backbone

            x2, x1, x0 = ResNet50Backbone(dtype=self.dtype,
                                          name="backbone")(x, train)
            if stop_trunk_grad:
                # reference freezes the ENTIRE resnet img_encoder
                # (Detection/train.py:126-127), so cut the backward pass
                # at the taps (BN stats still update in train mode)
                x2, x1, x0 = (jax.lax.stop_gradient(t) for t in (x2, x1, x0))
        else:
            x2, x1, x0 = ViTDetector(self.cfg, self.expansion,
                                     dtype=self.dtype, name="backbone")(
                x, train, deterministic, stop_trunk_grad)
        outs = YoloV3Head(self.num_classes, dtype=self.dtype, name="head")(
            x2, x1, x0, train)
        return tuple(jnp.transpose(o, (0, 3, 1, 2)) for o in outs)
