"""ECAMP pre-training model: MAE ViT-B/16 + SR branch + multimodal BERT.

TPU-native re-design of the reference ECAMP module
(Pre-training/module/model_ecamp.py:49-333):
  * encoder: patchify 224 -> +fixed sincos pos -> 75% token-drop -> cls ->
    12 blocks -> LN (model_ecamp.py:218-237)
  * decoder: 512-d, 4 blocks, 16 heads; mask-token re-insertion/unshuffle;
    pixel head (:240-264)
  * SR head: bilinear x2 + 2 conv3x3 + residual (:28-46)
  * losses: MIM + SR-window MSE (:276-300, quirk-faithful), entity-weighted
    MLM through the fusion BERT (:267-273 + bert branch)

Everything here is batched/static-shape: the masking gather, mask->pixel
expansion and SR window are vectorized ops (ops.masking), the 448->224
bicubic resize runs on device at the head of the jitted step (:318 parity).

Fixed sincos position embeddings are trace-time constants rather than
no-grad parameters — equivalent numerics, no optimizer masking needed.
"""

from __future__ import annotations

import os
from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import BertConfig, MAEDecoderConfig, ViTConfig
from ..ops.image_ops import resize_bicubic, resize_bilinear
from ..ops.losses import masked_pixel_losses, weighted_mlm_loss
from ..ops.masking import mask_to_pixel, random_masking, unpatchify
from .bert import MultimodalBert
from .layers import Block, Dense, LayerNorm, PatchEmbed
from .pos_embed import get_2d_sincos_pos_embed


class _Conv3x3Params(nn.Module):
    """Parameter holder matching nn.Conv's tree (kernel HWIO + bias) so the
    SR head can dispatch between the Pallas kernel and lax convs without
    changing the checkpoint layout."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, self.in_features, self.features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return kernel, bias


class SuperResolutionHead(nn.Module):
    """InterpolateConvSuperResolution (model_ecamp.py:28-46).

    The conv stack runs channels-first: with C=3, NHWC convs put the
    3-channel axis on the 128-lane dimension and XLA pays T(4,128) layout
    copies on every edge — measured 16.9 ms fwd+bwd inside the step at
    B=96 on v5e vs 13.1 ms for the same convs NCHW (tools/bench_sr.py;
    a fused Pallas stencil was also measured and LOST to XLA's NCHW conv
    — see kernels/sr_head.py, kept as an opt-in experiment).

    nchw_io=True takes AND returns (N, C, H, W), upsampling channels-first
    too — no layout edges at 448^2 at all (the caller keeps the whole SR
    branch NCHW; see ECAMP.__call__'s ECAMP_SR_NCHW_PATH).
    """

    scale: int = 2
    channels: int = 3
    dtype: jnp.dtype = jnp.float32
    nchw_io: bool = False
    s2d_io: bool = False   # return space-to-depth (N,H/4,W/4,48); NHWC in

    @nn.compact
    def __call__(self, x):
        from ..kernels.sr_head import sr_conv_stack, sr_supported, \
            _xla_reference

        if self.s2d_io:
            from ..ops.s2d_sr import sr_head_s2d

            assert self.scale == 2, "s2d SR head hardcodes 2x upsample/b=4"
            n, h, w, c = x.shape
            w1, b1 = _Conv3x3Params(c, self.channels, name="conv1")()
            w2, b2 = _Conv3x3Params(self.channels, self.channels,
                                    name="conv2")()
            return sr_head_s2d(x, w1, b1, w2, b2)
        if self.nchw_io:
            from ..ops.image_ops import resize_bilinear_nchw

            n, c, h, w = x.shape
            x_chw = resize_bilinear_nchw(x, (h * self.scale, w * self.scale))
        else:
            n, h, w, c = x.shape
            x = resize_bilinear(x, (h * self.scale, w * self.scale))
            x_chw = jnp.transpose(x, (0, 3, 1, 2))
        w1, b1 = _Conv3x3Params(c, self.channels, name="conv1")()
        w2, b2 = _Conv3x3Params(self.channels, self.channels, name="conv2")()

        if sr_supported(x_chw):  # opt-in (ECAMP_SR_KERNEL=1)
            out = sr_conv_stack(x_chw, w1, b1, w2, b2)
        else:
            out = _xla_reference(x_chw, w1, b1, w2, b2)
        if self.nchw_io:
            return out
        return jnp.transpose(out, (0, 2, 3, 1))


class ECAMP(nn.Module):
    vit: ViTConfig
    decoder: MAEDecoderConfig
    bert: BertConfig
    sr_window: int = 12
    sr_scale: int = 2
    dtype: jnp.dtype = jnp.float32

    def _pos_embed(self, dim: int) -> jnp.ndarray:
        grid = self.vit.grid_size
        return jnp.asarray(
            get_2d_sincos_pos_embed(dim, grid, cls_token=True))[None]

    @staticmethod
    def _fused_ce_available() -> bool:
        from ..kernels.fused_mlm_loss import fused_supported

        return fused_supported()

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], mask_ratio: float = 0.75,
                 deterministic: bool = False,
                 return_cross_probs: bool = False,
                 features_only: bool = False):
        c = self.vit
        # ECAMP_SR_NCHW_PATH=1: keep every 448^2 tensor channels-first —
        # ONE NHWC->NCHW transpose of the input, then the bicubic resize,
        # SR upsample+convs and the res-loss all run NCHW (xprof showed 8
        # full-image layout copies, ~4.6 ms/step at B=96, on the NHWC
        # formulation; the encoder still gets NHWC at 224^2, 1/4 the bytes)
        sr_nchw = os.environ.get("ECAMP_SR_NCHW_PATH") == "1"
        big_imgs = batch["image"].astype(self.dtype)  # (N, 448, 448, 3)
        big_chw = None
        if big_imgs.shape[1] == c.img_size and big_imgs.shape[2] == c.img_size:
            # already at encoder resolution: feed directly, exactly like the
            # visualization forward (Visualization/module/model_ecamp.py:
            # 308-319 takes the 224 image with no resize)
            imgs = big_imgs
            if sr_nchw:
                big_chw = jnp.transpose(big_imgs, (0, 3, 1, 2))
        elif sr_nchw:
            from ..ops.image_ops import resize_bicubic_nchw

            big_chw = jnp.transpose(big_imgs, (0, 3, 1, 2))
            imgs = jnp.transpose(
                resize_bicubic_nchw(big_chw, (c.img_size, c.img_size)),
                (0, 2, 3, 1))
        else:
            imgs = resize_bicubic(big_imgs, (c.img_size, c.img_size))

        latent, mask, ids_restore, ids_keep = self.image_encoder(
            imgs, mask_ratio, deterministic)

        outputs = {}
        if mask_ratio > 0:
            pred = self.image_decoder(latent, ids_restore, deterministic)
            pred_img = unpatchify(pred.astype(self.dtype), c.patch_size,
                                  channels=c.in_chans)
            # default: space-to-depth SR branch (3-channel 448^2 convs ->
            # 48-channel 112^2, same math — see ops/s2d_sr.py; the res
            # loss is a full-tensor mean of squares, permutation-
            # invariant, so it runs on s2d tensors with no inverse
            # transform; the 2x upsample is emitted directly in s2d
            # layout by a fused stride-2 conv and the SR-window mask is
            # generated at coarse resolution, so NO full-image transpose
            # remains). Kill-switch ECAMP_SR_S2D=0 -> direct layouts.
            sr_s2d = (os.environ.get("ECAMP_SR_S2D", "1") == "1"
                      and not sr_nchw
                      and self.sr_scale == 2  # s2d head hardcodes 2x/b=4
                      and big_imgs.shape[1] % 4 == 0
                      and big_imgs.shape[2] % 4 == 0
                      and (c.patch_size * self.sr_scale) % 4 == 0)
            pixel_mask, super_mask = mask_to_pixel(
                mask, batch["column"], batch["row"], c.patch_size,
                self.sr_scale, self.sr_window,
                super_stride=4 if sr_s2d else 1)
            if sr_s2d:
                from ..ops.s2d_sr import space_to_depth

                super_pred_s2d = SuperResolutionHead(
                    self.sr_scale, c.in_chans, dtype=self.dtype,
                    s2d_io=True, name="super_res")(pred_img)
                big_s2d = space_to_depth(big_imgs, 4)
                mim_loss, res_loss = masked_pixel_losses(
                    pred_img, imgs, super_pred_s2d, big_s2d,
                    pixel_mask, super_mask)
            elif sr_nchw:
                # (N,H,W,1) -> (N,1,H,W) is a pure reshape (size-1 axis)
                super_pred = SuperResolutionHead(
                    self.sr_scale, c.in_chans, dtype=self.dtype,
                    nchw_io=True, name="super_res")(
                        jnp.transpose(pred_img, (0, 3, 1, 2)))
                mim_loss, res_loss = masked_pixel_losses(
                    pred_img, imgs, super_pred, big_chw,
                    pixel_mask, jnp.transpose(super_mask, (0, 3, 1, 2)))
            else:
                super_pred = SuperResolutionHead(self.sr_scale, c.in_chans,
                                                 dtype=self.dtype,
                                                 name="super_res")(pred_img)
                mim_loss, res_loss = masked_pixel_losses(
                    pred_img, imgs, super_pred, big_imgs,
                    pixel_mask, super_mask)
            outputs.update(mim_loss=mim_loss, res_loss=res_loss)

        # report decoder bridge (model_ecamp.py:267-273)
        lat = Dense(self.bert.hidden_size, dtype=self.dtype,
                    name="bert_mlp")(latent)
        gap_token = lat[:, 1:, :].mean(axis=1, keepdims=True)
        patch_latent = lat[:, 1:, :]
        if features_only:
            # image-embedding serving path: the report-decoder bridge
            # features without running the BERT stack. Only batch["image"]
            # is required when mask_ratio == 0 (image_encoder cannot be an
            # apply() method target — it builds submodules outside compact).
            outputs["gap_feature"] = gap_token[:, 0]
            outputs["patch_latent"] = patch_latent
            return outputs
        has_loss = "labels" in batch and "weights" in batch
        use_fused = (has_loss and not return_cross_probs
                     and self._fused_ce_available())
        # lane-pad the 30k vocab projection when it feeds the CE loss:
        # exact math (padded bias -1e9 -> zero softmax mass), and the
        # three biggest matmuls of the step tile the MXU without ragged
        # 128-lane edges. Kill-switch ECAMP_PAD_VOCAB=0.
        pad_vocab = (has_loss and not use_fused
                     and os.environ.get("ECAMP_PAD_VOCAB", "1") == "1")
        bert_out = MultimodalBert(self.bert, dtype=self.dtype,
                                  name="bert")(
            patch_latent, gap_token, batch["ids"],
            attention_mask=batch.get("attention_mask"),
            token_type_ids=batch.get("type_ids"),
            deterministic=deterministic,
            return_cross_probs=return_cross_probs,
            return_mlm_features=use_fused,
            pad_vocab_lanes=pad_vocab)
        if return_cross_probs:
            bert_out, outputs["cross_attention"] = bert_out
        if use_fused:
            from ..kernels.fused_mlm_loss import fused_mlm_loss_sum

            feats, kernel, bias = bert_out
            n, L, d = feats.shape
            outputs["mlm_loss"] = fused_mlm_loss_sum(
                feats.reshape(n * L, d), kernel, bias,
                batch["labels"].reshape(-1),
                batch["weights"].reshape(-1)) / (n * L)
        else:
            logits = bert_out
            # raw-logit consumers get the true vocab width; the slice is
            # dead code under jit when only the loss is read
            outputs["mlm_logits"] = logits[..., :self.bert.vocab_size]
            if has_loss:
                # CE on the (possibly lane-padded) logits — exact: the
                # -1e9 pad bias underflows to zero softmax mass and
                # labels never index the pad
                outputs["mlm_loss"] = weighted_mlm_loss(
                    logits, batch["labels"], batch["weights"])
        return outputs

    def image_encoder(self, x, mask_ratio: float, deterministic: bool):
        """model_ecamp.py:218-237. Returns (tokens, mask, ids_restore,
        ids_keep)."""
        c = self.vit
        b = x.shape[0]
        x = PatchEmbed(c.patch_size, c.embed_dim, dtype=self.dtype,
                       name="patch_embed")(x)
        pos = self._pos_embed(c.embed_dim).astype(self.dtype)
        x = x + pos[:, 1:, :]
        L = x.shape[1]
        if mask_ratio > 0:
            rng = self.make_rng("masking")
            x, mask, ids_restore, ids_keep = random_masking(rng, x, mask_ratio)
        else:
            mask = jnp.zeros((b, L), dtype=x.dtype)
            ids_restore = jnp.broadcast_to(jnp.arange(L)[None], (b, L))
            ids_keep = ids_restore
        cls_token = self.param("cls_token", nn.initializers.normal(0.02),
                               (1, 1, c.embed_dim), jnp.float32)
        cls = cls_token.astype(self.dtype) + pos[:, :1, :]
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, c.embed_dim)), x],
                            axis=1)
        block_cls = (nn.remat(Block, static_argnums=(2,)) if c.remat
                     else Block)  # jax.checkpoint per block (config.remat)
        for i in range(c.depth):
            x = block_cls(c.num_heads, c.mlp_ratio, c.qkv_bias,
                          norm_eps=c.norm_eps, dtype=self.dtype,
                          name=f"blocks_{i}")(x, deterministic)
        x = LayerNorm(c.norm_eps, dtype=self.dtype, name="norm")(x)
        return x, mask, ids_restore, ids_keep

    def image_decoder(self, x, ids_restore, deterministic: bool):
        """model_ecamp.py:240-264."""
        dc = self.decoder
        b, n_kept, _ = x.shape
        L = ids_restore.shape[1]
        x = Dense(dc.embed_dim, dtype=self.dtype, name="decoder_embed")(x)
        mask_token = self.param("mask_token", nn.initializers.normal(0.02),
                                (1, 1, dc.embed_dim), jnp.float32)
        n_masked = L + 1 - n_kept
        mask_tokens = jnp.broadcast_to(mask_token.astype(self.dtype),
                                       (b, n_masked, dc.embed_dim))
        x_ = jnp.concatenate([x[:, 1:, :], mask_tokens], axis=1)
        from ..ops.masking import permute_tokens

        x_ = permute_tokens(x_, ids_restore)
        x = jnp.concatenate([x[:, :1, :], x_], axis=1)
        x = x + self._pos_embed(dc.embed_dim).astype(self.dtype)
        block_cls = (nn.remat(Block, static_argnums=(2,)) if dc.remat
                     else Block)
        for i in range(dc.depth):
            x = block_cls(dc.num_heads, dc.mlp_ratio, True,
                          norm_eps=dc.norm_eps, dtype=self.dtype,
                          name=f"decoder_blocks_{i}")(x, deterministic)
        x = LayerNorm(dc.norm_eps, dtype=self.dtype, name="decoder_norm")(x)
        x = Dense(self.vit.patch_size ** 2 * self.vit.in_chans,
                  dtype=self.dtype, name="decoder_pred")(x)
        return x[:, 1:, :]
