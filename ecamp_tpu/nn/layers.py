"""Shared transformer layers (flax.linen).

One implementation of the timm-0.4.12-semantics ViT block serves every model
in the framework (the reference keeps five divergent ViT copies —
SURVEY §2.8). Parameter names mirror the torch module tree (qkv/proj/fc1/
fc2/norm1/norm2, LayerNorm weight+bias) so checkpoint import is mechanical.

Reference semantics: timm Block as used by model_ecamp.py:66-68 and
Classification/models_vit.py:60-98 — pre-LN, fused qkv with bias, exact
(erf) GELU, no layer-scale / drop-path at the reference's settings.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..kernels import dot_product_attention, fused_layer_norm


class LayerNorm(nn.Module):
    """LayerNorm with torch-style param names (weight, bias) and fp32 stats.

    Dispatches to the Pallas fused kernel on TPU.
    """

    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (d,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
        return fused_layer_norm(x.astype(self.dtype), weight, bias, self.eps)


class Dense(nn.Dense):
    """nn.Dense with xavier-uniform default kernel init (reference
    model_ecamp.py:127-132 applies xavier_uniform to every Linear)."""

    kernel_init: Callable = nn.initializers.xavier_uniform()


class Dropout(nn.Module):
    """Dropout from uint16 random bits.

    jax.random.bernoulli draws 32 bits per element; at the pretrain shapes
    that is ~75 MB of u32 traffic per BERT-hidden dropout site and ~1 GB
    across the step's ~14 active sites (xprof, DESIGN.md). 16 bits halve
    it. The keep-threshold quantizes to 1/65536 (rate 0.1 ->
    0.1000061...) — immaterial for a random regularizer — and the rescale
    is derived from the *quantized* keep probability
    (65536/(65536-thresh)), so E[dropout(x)] == x exactly. In particular
    a rate small enough to round to thresh=0 becomes an exact identity
    rather than a spurious up-scale. API-compatible with nn.Dropout (same
    'dropout' rng collection, same deterministic flag).
    """

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        thresh = min(int(round(self.rate * 65536)), 65535)
        if thresh == 0:
            return x
        bits = jax.random.bits(self.make_rng("dropout"), x.shape,
                               dtype=jnp.uint16)
        keep = bits >= jnp.uint16(thresh)
        scale = jnp.asarray(65536.0 / (65536 - thresh), x.dtype)
        return jnp.where(keep, x * scale, jnp.zeros_like(x))


class Mlp(nn.Module):
    hidden_features: int
    out_features: int
    drop_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    act: Callable = lambda x: jax.nn.gelu(x, approximate=False)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = Dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = self.act(x)
        x = Dropout(self.drop_rate)(x, deterministic=deterministic)
        x = Dense(self.out_features, dtype=self.dtype, name="fc2")(x)
        x = Dropout(self.drop_rate)(x, deterministic=deterministic)
        return x


class Attention(nn.Module):
    """timm-style multi-head self-attention with fused qkv projection."""

    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, return_probs: bool = False):
        b, n, d = x.shape
        head_dim = d // self.num_heads
        qkv = Dense(3 * d, use_bias=self.qkv_bias, dtype=self.dtype,
                    name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))  # (3, B, H, N, hd)
        # under a dp x tp mesh, pin heads to the model axis (no-op
        # otherwise) — stops GSPMD involuntary full rematerialization
        from ..core.mesh import constrain_heads

        q, k, v = (constrain_heads(qkv[0]), constrain_heads(qkv[1]),
                   constrain_heads(qkv[2]))
        out = dot_product_attention(q, k, v, return_probs=return_probs)
        if not return_probs:
            out = constrain_heads(out)
        probs = None
        if return_probs:
            out, probs = out
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, d)
        out = Dropout(self.attn_drop)(out, deterministic=deterministic)
        out = Dense(d, dtype=self.dtype, name="proj")(out)
        out = Dropout(self.proj_drop)(out, deterministic=deterministic)
        if return_probs:
            return out, probs
        return out


class DropPath(nn.Module):
    """Stochastic depth (timm DropPath): drop a residual BRANCH per sample
    with probability `rate`, rescaling kept samples by 1/(1-rate). The
    reference's classification fine-tune trains with drop_path_rate=0.1
    (Classification/train.py:127, linspace-ramped across blocks by timm)."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        keep = jax.random.bernoulli(self.make_rng("dropout"),
                                    1.0 - self.rate, shape)
        return jnp.where(keep, x / (1.0 - self.rate), jnp.zeros_like(x))


class Block(nn.Module):
    """Pre-LN transformer block (timm Block semantics)."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop: float = 0.0
    norm_eps: float = 1e-6
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d = x.shape[-1]
        y = LayerNorm(self.norm_eps, dtype=self.dtype, name="norm1")(x)
        y = Attention(self.num_heads, self.qkv_bias, self.attn_drop,
                      self.drop_rate, dtype=self.dtype, name="attn")(
                          y, deterministic=deterministic)
        x = x + DropPath(self.drop_path)(y, deterministic=deterministic)
        y = LayerNorm(self.norm_eps, dtype=self.dtype, name="norm2")(x)
        y = Mlp(int(d * self.mlp_ratio), d, self.drop_rate,
                dtype=self.dtype, name="mlp")(y, deterministic=deterministic)
        return x + DropPath(self.drop_path)(y, deterministic=deterministic)


class PatchEmbed(nn.Module):
    """Image-to-patch embedding via strided conv (timm PatchEmbed).

    Input is NHWC (TPU-native layout; the importer transposes the
    reference's OIHW conv weight).
    """

    patch_size: int = 16
    embed_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    dtype=self.dtype, name="proj")(x)
        b, h, w, d = x.shape
        return x.reshape(b, h * w, d)
