"""Multimodal BERT text branch.

Re-implements, with HF-BERT numerics, the reference's 6-layer multimodal
masked-LM (module/bert_modeling.py:10-227, bert_encoder.py:12-22) and the
entity-context fusion layer (module/context_fusion.py:7-72):

  embeddings -> ECAMPFusionLayer(text self-attn -> text->image cross-attn
  + gap-token injection -> FFN) -> 6x BertLayer -> MLM head.

Numerics that matter for checkpoint parity:
  * LayerNorm eps 1e-12 (bert_config.py:76)
  * BertSelfOutput/BertOutput residual-then-LN ordering
  * the cross-attention is a bare BertSelfAttention (no output dense) whose
    context output gets gap_mlp(gap_token) added BEFORE out_layer
    (context_fusion.py:45-56)
  * the MLM loss is a per-token weighted CE over ALL 256 positions with no
    -100 masking (bert_modeling.py:211-217) — implemented in ops.losses.

Attention runs through the shared Pallas/XLA dispatch (kernels.attention).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.config import BertConfig
from ..kernels import dot_product_attention
from .layers import Dense, Dropout, LayerNorm

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def extend_attention_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """(B, L) 1/0 mask -> additive (B, 1, 1, L) bias (HF
    get_extended_attention_mask semantics)."""
    return (1.0 - mask.astype(jnp.float32))[:, None, None, :] * _NEG_INF


class BertSelfAttention(nn.Module):
    """HF BertSelfAttention: separate q/k/v, context output (no out dense).

    With kv_states it acts as cross-attention, exactly as the fusion layer
    uses it (context_fusion.py:15,45-53).

    Deliberate TPU deviation (default): HF applies attention dropout to the
    (B,H,Nq,Nk) probability tensor; we apply the same-rate dropout to the
    (B,Nq,D) context output instead, so the probs never need to be
    materialized in HBM and the fused attention kernel stays usable.
    Identical in eval (activation-parity tested); in training it is a
    same-strength regularizer on the attention path, not a bitwise match.
    cfg.exact_attn_dropout=True opts into the HF-exact probs dropout via
    the XLA path (for run-for-run comparison with the reference; measured
    A/B in DESIGN.md).
    """

    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, bias=None, kv_states=None,
                 deterministic: bool = True, return_probs: bool = False):
        c = self.cfg
        h = c.num_attention_heads
        d = c.hidden_size
        hd = d // h
        kv = hidden if kv_states is None else kv_states
        b, nq = hidden.shape[0], hidden.shape[1]
        nk = kv.shape[1]

        # constrain_heads: under a dp x tp mesh pin heads to the model
        # axis (no-op otherwise) — see core/mesh.py TP constraints
        from ..core.mesh import constrain_heads

        def split(x, n):
            return constrain_heads(
                jnp.transpose(x.reshape(b, n, h, hd), (0, 2, 1, 3)))

        q = split(Dense(d, dtype=self.dtype, name="query")(hidden), nq)
        k = split(Dense(d, dtype=self.dtype, name="key")(kv), nk)
        v = split(Dense(d, dtype=self.dtype, name="value")(kv), nk)
        if c.exact_attn_dropout and not deterministic:
            # HF-exact: softmax in fp32, dropout on the prob tensor, then
            # the value matmul (transformers BertSelfAttention order)
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            logits = logits * (hd ** -0.5)
            if bias is not None:
                logits = logits + bias
            probs = jax.nn.softmax(logits, axis=-1)
            probs = Dropout(c.attention_probs_dropout_prob)(
                probs, deterministic=False)
            out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
            out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, nq, d)
            if return_probs:
                return out, probs
            return out
        out = dot_product_attention(q, k, v, bias=bias, scale=hd ** -0.5,
                                    return_probs=return_probs)
        probs = None
        if return_probs:
            out, probs = out
        else:
            out = constrain_heads(out)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, nq, d)
        out = Dropout(c.attention_probs_dropout_prob)(
            out, deterministic=deterministic)
        if return_probs:
            return out, probs
        return out


class BertSelfOutput(nn.Module):
    """dense -> dropout -> LN(x + residual)."""

    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, residual, deterministic: bool = True):
        c = self.cfg
        hidden = Dense(c.hidden_size, dtype=self.dtype, name="dense")(hidden)
        hidden = Dropout(c.hidden_dropout_prob)(hidden, deterministic=deterministic)
        return LayerNorm(c.layer_norm_eps, dtype=self.dtype,
                         name="LayerNorm")(hidden + residual)


class BertAttention(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, bias=None, deterministic: bool = True):
        ctx = BertSelfAttention(self.cfg, dtype=self.dtype, name="self")(
            hidden, bias=bias, deterministic=deterministic)
        return BertSelfOutput(self.cfg, dtype=self.dtype, name="output")(
            ctx, hidden, deterministic=deterministic)


class BertIntermediate(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Dense(self.cfg.intermediate_size, dtype=self.dtype, name="dense")(x)
        return jax.nn.gelu(x, approximate=False)


class BertOutput(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, residual, deterministic: bool = True):
        c = self.cfg
        hidden = Dense(c.hidden_size, dtype=self.dtype, name="dense")(hidden)
        hidden = Dropout(c.hidden_dropout_prob)(hidden, deterministic=deterministic)
        return LayerNorm(c.layer_norm_eps, dtype=self.dtype,
                         name="LayerNorm")(hidden + residual)


class BertLayer(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, bias=None, deterministic: bool = True):
        attn_out = BertAttention(self.cfg, dtype=self.dtype, name="attention")(
            hidden, bias=bias, deterministic=deterministic)
        inter = BertIntermediate(self.cfg, dtype=self.dtype,
                                 name="intermediate")(attn_out)
        return BertOutput(self.cfg, dtype=self.dtype, name="output")(
            inter, attn_out, deterministic=deterministic)


class FusionLayer(nn.Module):
    """ECAMPFusionLayer (context_fusion.py:7-72)."""

    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, latent, gap_token, text_bias=None,
                 deterministic: bool = True, return_cross_probs: bool = False):
        attention_output = BertAttention(self.cfg, dtype=self.dtype,
                                         name="attention")(
            hidden, bias=text_bias, deterministic=deterministic)
        cross = BertSelfAttention(self.cfg, dtype=self.dtype,
                                  name="cross_self_attention")
        # image mask is all-ones in the reference (bert_modeling.py:79) ->
        # zero additive bias; omit it.
        cross_out = cross(attention_output, bias=None, kv_states=latent,
                          deterministic=deterministic,
                          return_probs=return_cross_probs)
        cross_probs = None
        if return_cross_probs:
            cross_out, cross_probs = cross_out
        gap = Dense(self.cfg.hidden_size, dtype=self.dtype,
                    name="gap_mlp")(gap_token)
        cross_out = cross_out + gap
        fused = BertSelfOutput(self.cfg, dtype=self.dtype, name="out_layer")(
            cross_out, attention_output, deterministic=deterministic)
        inter = BertIntermediate(self.cfg, dtype=self.dtype,
                                 name="intermediate")(fused)
        out = BertOutput(self.cfg, dtype=self.dtype, name="output")(
            inter, fused, deterministic=deterministic)
        if return_cross_probs:
            return out, cross_probs
        return out


class BertEmbeddings(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, deterministic: bool = True):
        c = self.cfg
        b, L = input_ids.shape
        emb_init = nn.initializers.normal(stddev=c.initializer_range)
        word = nn.Embed(c.vocab_size, c.hidden_size, embedding_init=emb_init,
                        param_dtype=jnp.float32, name="word_embeddings")(input_ids)
        pos_ids = jnp.arange(L)[None, :]
        pos = nn.Embed(c.max_position_embeddings, c.hidden_size,
                       embedding_init=emb_init, param_dtype=jnp.float32,
                       name="position_embeddings")(pos_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        tok = nn.Embed(c.type_vocab_size, c.hidden_size, embedding_init=emb_init,
                       param_dtype=jnp.float32,
                       name="token_type_embeddings")(token_type_ids)
        x = (word + pos + tok).astype(self.dtype)
        x = LayerNorm(c.layer_norm_eps, dtype=self.dtype, name="LayerNorm")(x)
        return Dropout(c.hidden_dropout_prob)(x, deterministic=deterministic)


class _VocabProjection(nn.Module):
    """Vocab decoder with Dense-compatible param names (kernel/bias) that
    can hand its weights to the fused projection+CE Pallas kernel."""

    vocab_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, return_weights: bool = False,
                 pad_lanes: bool = False):
        d = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.xavier_uniform(),
                            (d, self.vocab_size), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.vocab_size,), jnp.float32)
        if return_weights:
            return kernel.astype(self.dtype), bias
        if pad_lanes:
            # pad the vocab dim to a multiple of the 128-lane tile:
            # 30000 % 128 != 0 leaves every MXU tile row ragged in the
            # three largest matmuls of the step (logits fwd, dL/dx,
            # dL/dW). Padded bias -1e9 -> exp underflows to exactly 0 in
            # softmax-CE, so losses on padded logits are bit-correct;
            # callers slice [..., :V] for any consumer that needs raw
            # logits (dead code under jit when only the loss is used).
            pad = (-self.vocab_size) % 128
            if pad:
                kernel = jnp.pad(kernel, ((0, 0), (0, pad)))
                bias = jnp.pad(bias, ((0, pad),), constant_values=-1e9)
        return (x @ kernel.astype(self.dtype)
                + bias.astype(self.dtype))


class MLMHead(nn.Module):
    """HF BertOnlyMLMHead: transform (dense+gelu+LN) + decoder to vocab.

    With return_features=True, returns (features, decoder_kernel,
    decoder_bias) so the caller can run the fused vocab-projection+CE
    Pallas kernel (the 30k-way projection is the largest matmul in the
    pretrain step, ~11.8 GF/sample) instead of materializing logits.
    """

    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, return_features: bool = False,
                 pad_lanes: bool = False):
        c = self.cfg
        x = Dense(c.hidden_size, dtype=self.dtype, name="transform_dense")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = LayerNorm(c.layer_norm_eps, dtype=self.dtype,
                      name="transform_LayerNorm")(x)
        proj = _VocabProjection(c.vocab_size, dtype=self.dtype,
                                name="decoder")
        if return_features:
            kernel, bias = proj(x, return_weights=True)
            return x, kernel, bias
        return proj(x, pad_lanes=pad_lanes)


class MultimodalBert(nn.Module):
    """Full text branch: embeddings -> fusion -> encoder -> MLM logits.

    Equivalent of MultimodalBertMaskedLM (bert_modeling.py:160-227); the
    weighted-CE loss lives in ops.losses.weighted_mlm_loss.
    """

    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, latent, gap_token, input_ids, attention_mask=None,
                 token_type_ids=None, deterministic: bool = True,
                 return_cross_probs: bool = False,
                 return_mlm_features: bool = False,
                 pad_vocab_lanes: bool = False):
        c = self.cfg
        text_bias = None
        if attention_mask is not None:
            text_bias = extend_attention_mask(attention_mask)
        x = BertEmbeddings(c, dtype=self.dtype, name="embeddings")(
            input_ids, token_type_ids, deterministic=deterministic)
        fused = FusionLayer(c, dtype=self.dtype, name="context_fusion_layer")(
            x, latent, gap_token, text_bias=text_bias,
            deterministic=deterministic, return_cross_probs=return_cross_probs)
        cross_probs = None
        if return_cross_probs:
            fused, cross_probs = fused
        h = fused
        layer_cls = (nn.remat(BertLayer, static_argnums=(3,)) if c.remat
                     else BertLayer)  # jax.checkpoint per layer
        for i in range(c.num_hidden_layers):
            h = layer_cls(c, dtype=self.dtype, name=f"layer_{i}")(
                h, text_bias, deterministic)
        out = MLMHead(c, dtype=self.dtype, name="cls")(
            h, return_features=return_mlm_features,
            pad_lanes=pad_vocab_lanes)
        if return_cross_probs:
            return out, cross_probs
        return out
