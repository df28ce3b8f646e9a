"""ViT trunk + classification model.

One trunk (this module) feeds all heads; the reference's five ViT copies
(Pre-training/module/model_ecamp.py image encoder,
Classification/models_vit.py, Segmentation/models_vit{,_RIGA}.py,
Detection/detector_backbone_vit.py) collapse onto it (SURVEY §2.8).

Forward semantics match timm 0.4.12 as the reference uses it:
patch_embed -> prepend cls -> +pos_embed (learnable) -> blocks ->
either global-pool(mean of patch tokens)+fc_norm (Classification/
models_vit.py:90-93) or norm+cls-token (:95-96).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.config import ViTConfig
from .layers import Dropout, Block, Dense, LayerNorm, PatchEmbed


class VisionTransformer(nn.Module):
    """Trunk: returns the full token sequence (cls + patches) after blocks.

    Heads decide what normalization to apply (timm deletes `norm` when
    global_pool is set and seg/det variants delete it outright — so `norm`
    is NOT applied here; it belongs to heads that use it).
    """

    cfg: ViTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = self.cfg
        b = x.shape[0]
        x = PatchEmbed(c.patch_size, c.embed_dim, dtype=self.dtype,
                       name="patch_embed")(x)
        n = x.shape[1]
        cls_token = self.param("cls_token",
                               nn.initializers.normal(stddev=0.02),
                               (1, 1, c.embed_dim), jnp.float32)
        pos_embed = self.param("pos_embed",
                               nn.initializers.normal(stddev=0.02),
                               (1, n + 1, c.embed_dim), jnp.float32)
        cls = jnp.broadcast_to(cls_token.astype(self.dtype),
                               (b, 1, c.embed_dim))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + pos_embed.astype(self.dtype)
        x = Dropout(c.drop_rate)(x, deterministic=deterministic)
        block_cls = (nn.remat(Block, static_argnums=(2,)) if c.remat
                     else Block)  # jax.checkpoint per block (config.remat)
        for i in range(c.depth):
            # stochastic-depth rate ramps linearly across blocks (timm:
            # torch.linspace(0, drop_path_rate, depth))
            dpr = (c.drop_path_rate * i / max(c.depth - 1, 1)
                   if c.drop_path_rate else 0.0)
            x = block_cls(c.num_heads, c.mlp_ratio, c.qkv_bias, c.drop_rate,
                          c.attn_drop_rate, c.norm_eps, dpr,
                          dtype=self.dtype,
                          name=f"blocks_{i}")(x, deterministic)
        return x


class ViTClassifier(nn.Module):
    """Classification / linear-probe model
    (reference Classification/models_vit.py:60-98 + head)."""

    cfg: ViTConfig
    num_classes: int
    global_pool: bool = True
    head_init_std: float = 2e-5  # trunc_normal_ re-init (train.py:147)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 stop_trunk_grad: bool = False,
                 features_only: bool = False):
        tokens = VisionTransformer(self.cfg, dtype=self.dtype,
                                   name="trunk")(x, deterministic)
        if stop_trunk_grad:
            # linear-probe mode (train.py:156-159 freezes all but head):
            # grads below the head are optimizer-masked to zero, so skip
            # the dead trunk backward — the reference's requires_grad=False
            # cost semantics. Numerically identical updates.
            tokens = jax.lax.stop_gradient(tokens)
        if self.global_pool:
            feat = tokens[:, 1:, :].mean(axis=1)
            feat = LayerNorm(self.cfg.norm_eps, dtype=self.dtype,
                             name="fc_norm")(feat)
        else:
            tokens = LayerNorm(self.cfg.norm_eps, dtype=self.dtype,
                               name="norm")(tokens)
            feat = tokens[:, 0]
        if features_only:
            # pooled pre-head feature (probing/analysis) — a flag rather
            # than a separate method: flax allows only one compact method,
            # and a non-compact method cannot build submodules
            return feat
        logits = Dense(
            self.num_classes, dtype=jnp.float32,
            kernel_init=nn.initializers.truncated_normal(
                stddev=self.head_init_std, lower=-2.0, upper=2.0),
            name="head")(feat.astype(jnp.float32))
        return logits
