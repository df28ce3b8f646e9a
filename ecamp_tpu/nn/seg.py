"""Segmentation models (SIIM/RSNA single decoder, RIGA dual decoder).

Reference: Segmentation/models_vit.py:27-145 and models_vit_RIGA.py:109-151.
The ViT encoder tokens pass a seg_head Linear and reshape to a (B, 14, 14,
768) NHWC feature map, then a 4-stage conv+BN+ReLU+bilinear(align_corners)
x2 decoder produces full-resolution logits.

BatchNorm under data parallelism: batch stats are computed with plain
jnp reductions inside the jitted sharded step, so XLA emits the cross-chip
reduction automatically — i.e. SyncBatchNorm semantics for free
(SURVEY §7.4 hard-part #5; the reference syncs BN only in pretraining).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.config import ViTConfig
from ..ops.image_ops import upsample_align_corners
from .layers import Dense
from .vit import VisionTransformer


class SegEncoder(nn.Module):
    """ViT trunk + seg_head token-to-map projection
    (Segmentation/models_vit.py:30-63)."""

    cfg: ViTConfig
    sample_rate: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 stop_trunk_grad: bool = False):
        c = self.cfg
        b, h_img = x.shape[0], x.shape[1]
        tokens = VisionTransformer(c, dtype=self.dtype, name="trunk")(
            x, deterministic)
        if stop_trunk_grad:
            # frozen-encoder training (train.py:128-133): the trunk's
            # gradients are masked to zero by the optimizer anyway, so skip
            # the dead backward entirely — the reference's
            # requires_grad=False does exactly this on the torch side.
            # Numerically identical updates (test_train_steps).
            tokens = jax.lax.stop_gradient(tokens)
        tokens = tokens[:, 1:, :]
        sample_v = 2 ** self.sample_rate
        sub = c.patch_size // sample_v  # p1 == p2 (1 at the defaults)
        out_dim = c.patch_size ** 2 * c.embed_dim // (sample_v ** 2)
        tokens = Dense(out_dim, dtype=self.dtype, name="seg_head")(tokens)
        grid = h_img // c.patch_size
        # einops: b (h w) (p1 p2 c) -> b (h p1) (w p2) c   [NHWC]
        t = tokens.reshape(b, grid, grid, sub, sub, c.embed_dim)
        t = jnp.transpose(t, (0, 1, 3, 2, 4, 5))
        return t.reshape(b, grid * sub, grid * sub, c.embed_dim)


class ConvDecoder(nn.Module):
    """4x (conv3x3 + BN + ReLU + bilinear-up x2) + final conv
    (Segmentation/models_vit.py:70-106)."""

    out_channels: int = 1
    features: Sequence[int] = (512, 256, 128, 64)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, f in enumerate(self.features):
            x = nn.Conv(f, (3, 3), padding=1, dtype=self.dtype,
                        name=f"decoder_{i + 1}_conv")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"decoder_{i + 1}_bn")(x)
            x = jax.nn.relu(x)
            x = upsample_align_corners(x, 2)
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       dtype=jnp.float32, name="final_out")(
                           x.astype(jnp.float32))


class SegViT(nn.Module):
    """Single-decoder segmentation model (SIIM / RSNA)."""

    cfg: ViTConfig
    out_channels: int = 1
    sample_rate: int = 4
    features: Sequence[int] = (512, 256, 128, 64)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, deterministic: bool = True,
                 stop_trunk_grad: bool = False):
        feat = SegEncoder(self.cfg, self.sample_rate, dtype=self.dtype,
                          name="encoder")(x, deterministic, stop_trunk_grad)
        return ConvDecoder(self.out_channels, self.features,
                           dtype=self.dtype, name="decoder")(feat, train)


class SegViTDual(nn.Module):
    """Dual-decoder RIGA model: disc + cup (models_vit_RIGA.py:135-151)."""

    cfg: ViTConfig
    out_channels: int = 1
    sample_rate: int = 4
    features: Sequence[int] = (512, 256, 128, 64)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, deterministic: bool = True,
                 stop_trunk_grad: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        feat = SegEncoder(self.cfg, self.sample_rate, dtype=self.dtype,
                          name="encoder")(x, deterministic, stop_trunk_grad)
        disc = ConvDecoder(self.out_channels, self.features,
                           dtype=self.dtype, name="decoder_disc")(feat, train)
        cup = ConvDecoder(self.out_channels, self.features,
                          dtype=self.dtype, name="decoder_cup")(feat, train)
        return disc, cup
