"""Loss functions.

Each reproduces the reference's exact reduction semantics (documented
quirks included — SURVEY §2.1), with fp32 accumulation.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def softmax_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-element CE, labels are int ids. logits (..., V) -> (...).

    max/exp run in the logits dtype (bf16 under the training policy — the
    30k-vocab logits tensor is ~1 GB/batch, so fp32 materialization would
    double the dominant HBM stream); the sum and the final arithmetic
    accumulate in fp32.
    """
    m = jnp.max(logits, axis=-1, keepdims=True)
    s = jnp.sum(jnp.exp(logits - m), axis=-1, dtype=jnp.float32)
    logz = m[..., 0].astype(jnp.float32) + jnp.log(s)
    gold = jnp.take_along_axis(logits, labels[..., None],
                               axis=-1)[..., 0].astype(jnp.float32)
    return logz - gold


def weighted_mlm_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                      weights: jnp.ndarray) -> jnp.ndarray:
    """Entity-reweighted MLM loss (bert_modeling.py:211-217).

    Faithful to the reference: CE over ALL positions (labels are the
    unmasked original ids everywhere, pads included — no -100 ignore),
    scaled per-token by `weights`, then mean over B*L.
    """
    ce = softmax_cross_entropy(logits, labels)  # (B, L)
    return jnp.mean(ce * weights.astype(jnp.float32))


def masked_pixel_losses(pred_img: jnp.ndarray, imgs: jnp.ndarray,
                        super_pred: jnp.ndarray, big_imgs: jnp.ndarray,
                        pixel_mask: jnp.ndarray, super_mask: jnp.ndarray
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """MIM + SR reconstruction losses (model_ecamp.py:276-300).

    Faithful semantics: MSE with reduction='mean' over the FULL tensor of
    (pred*mask - target*mask) — the loss scale depends on mask ratio / SR
    window area, not normalized per masked pixel.
    """
    # squares in the input dtype (bf16 under the training policy — halves
    # HBM traffic on the 448^2 tensors), accumulation in fp32 via the
    # reduction dtype
    pm = pixel_mask.astype(pred_img.dtype)
    sm = super_mask.astype(super_pred.dtype)
    mim = jnp.mean(jnp.square(pred_img * pm - imgs.astype(pred_img.dtype) * pm),
                   dtype=jnp.float32)
    res = jnp.mean(jnp.square(super_pred * sm
                              - big_imgs.astype(super_pred.dtype) * sm),
                   dtype=jnp.float32)
    return mim, res


def sigmoid_bce(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean BCE-with-logits (classification multilabel path,
    Classification/train.py:442-447)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    per = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(per)


def focal_loss(logits: jnp.ndarray, targets: jnp.ndarray,
               gamma: float = 2.0) -> jnp.ndarray:
    """Focal loss as the reference writes it
    (Segmentation/utils/segmentation_loss.py:55-76): stable BCE-with-logits
    weighted by exp(gamma * logsigmoid(-x*(2t-1))), mean-reduced."""
    x = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    max_val = jnp.maximum(-x, 0.0)
    bce = x - x * t + max_val + jnp.log(jnp.exp(-max_val) + jnp.exp(-x - max_val))
    invprobs = jax.nn.log_sigmoid(-x * (t * 2.0 - 1.0))
    return jnp.mean(jnp.exp(invprobs * gamma) * bce)


def dice_coefficient(logits: jnp.ndarray, targets: jnp.ndarray,
                     smooth: float = 1.0) -> jnp.ndarray:
    """Soft dice over the whole batch (segmentation_loss.py:7-24) —
    note the reference flattens across the batch, not per-sample."""
    p = jax.nn.sigmoid(logits.astype(jnp.float32)).reshape(-1)
    t = targets.astype(jnp.float32).reshape(-1)
    inter = jnp.sum(p * t)
    return (2.0 * inter + smooth) / (jnp.sum(p) + jnp.sum(t) + smooth)


def mixed_loss(logits: jnp.ndarray, targets: jnp.ndarray,
               alpha: float = 10.0, gamma: float = 2.0) -> jnp.ndarray:
    """MixedLoss = alpha*focal - log(dice) (segmentation_loss.py:79-90)."""
    return alpha * focal_loss(logits, targets, gamma) - jnp.log(
        dice_coefficient(logits, targets))
