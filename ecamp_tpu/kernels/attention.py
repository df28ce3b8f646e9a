"""Attention dispatch: Pallas TPU flash kernel with an XLA fallback.

Covers every attention in the framework — ViT self-attention (50/197/785
tokens), BERT self-attention (256), and the text-to-image cross-attention of
the fusion layer (256 -> 49/196). Replaces the reference's cuDNN-backed
torch attention (timm Block attn; HF BertSelfAttention).

The XLA fallback is used on CPU tests, for short sequences where a flash
kernel buys nothing, and when attention probabilities must be materialized
(visualization CLI, reference Visualization/main_visualization.py:106-178).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .flash_attention import flash_attention, flash_supported


def _xla_attention(q, k, v, bias=None, scale=None, return_probs=False):
    """Reference XLA attention; softmax statistics in fp32."""
    *_, n, d = q.shape
    scale = (d ** -0.5) if scale is None else scale
    # fp32 inputs get exact matmuls (TPU default would truncate to bf16
    # passes); bf16 inputs are native single-pass either way.
    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    logits = jnp.einsum("...qd,...kd->...qk", q, k,
                        preferred_element_type=jnp.float32,
                        precision=prec) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("...qk,...kd->...qd", probs.astype(q.dtype), v,
                     preferred_element_type=jnp.float32, precision=prec)
    out = out.astype(q.dtype)
    if return_probs:
        return out, probs
    return out


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    return_probs: bool = False,
    use_flash: Optional[bool] = None,
):
    """q,k,v: (B, H, N, D). bias: broadcastable to (B, H, Nq, Nk) additive.

    Returns (B, H, Nq, D); with return_probs=True also the fp32 probs
    (forces the XLA path — flash kernels never materialize probs).
    """
    if return_probs:
        return _xla_attention(q, k, v, bias, scale, return_probs=True)
    if use_flash is None:
        import os

        use_flash = (jax.default_backend() == "tpu"
                     and os.environ.get("ECAMP_NO_FLASH") != "1"
                     and flash_supported(q, k, v, bias))
    if use_flash:
        return flash_attention(q, k, v, bias=bias, scale=scale)
    return _xla_attention(q, k, v, bias, scale)
