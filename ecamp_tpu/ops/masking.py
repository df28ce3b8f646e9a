"""MAE masking ops, vectorized for TPU.

random_masking matches the reference's argsort-of-noise scheme
(model_ecamp.py:168-193). mask_to_pixel replaces the reference's per-sample
Python loop + hardcoded-.cuda() kron (model_ecamp.py:196-215 — a host-style
hot spot executed on device every step) with broadcasting that XLA fuses.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp


def permute_tokens(x: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """x[(b, ids[b, k], :)] — the token gather used by MAE masking and the
    decoder's mask-token unshuffle.

    Default lowering is a one-hot x tokens matmul: a batched (K, L) @
    (L, D) contraction rides the MXU and its BACKWARD is the transposed
    matmul, where a gather's backward is a scatter-add (layout-copy
    prone). Measured +0.6% step throughput vs take_along_axis at B=96 on
    v5e (DESIGN round-3 layout A/B). Bit-exact for one-hot rows: each
    output element is a sum with exactly one nonzero term.
    ECAMP_GATHER_PERMUTE=1 restores the take_along_axis lowering."""
    if os.environ.get("ECAMP_GATHER_PERMUTE") == "1":
        return jnp.take_along_axis(x, ids[:, :, None], axis=1)
    p = jax.nn.one_hot(ids, x.shape[1], dtype=x.dtype)
    # fp32 inputs must not round through the MXU's bf16 passes — the
    # bit-exactness claim needs full-precision accumulation there (the
    # bf16 hot path keeps single-pass MXU matmuls)
    prec = "highest" if x.dtype == jnp.float32 else None
    return jnp.einsum("bkl,bld->bkd", p, x, precision=prec)


def random_masking(rng: jax.Array, x: jnp.ndarray, mask_ratio: float
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-sample random token masking by argsorted uniform noise.

    x: (N, L, D). Returns (x_kept (N, len_keep, D), mask (N, L) with 1 =
    removed, ids_restore (N, L), ids_keep (N, len_keep)).
    """
    n, L, d = x.shape
    len_keep = int(L * (1 - mask_ratio))
    noise = jax.random.uniform(rng, (n, L))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :len_keep]
    x_kept = permute_tokens(x, ids_keep)
    mask = jnp.ones((n, L), dtype=x.dtype)
    mask = mask.at[:, :len_keep].set(0.0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return x_kept, mask, ids_restore, ids_keep


def mask_to_pixel(mask: jnp.ndarray, column: jnp.ndarray, row: jnp.ndarray,
                  patch_size: int = 16, sr_scale: int = 2, window: int = 12,
                  super_stride: int = 1
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Expand a (N, L) patch mask to pixel space, plus the SR loss window.

    Returns NHWC masks: pixel_mask (N, g*p, g*p, 1) marking removed patches,
    super_mask (N, g*p*s/super_stride, g*p*s/super_stride, 1) marking the
    window x window patch block starting at (column, row) — column indexes
    the vertical patch axis, matching
    super_mask[i, column:column+12, row:row+12] = 1 (model_ecamp.py:208).
    Channel dim broadcasting replaces the reference's .repeat(1, 3, 1, 1).

    super_stride > 1 emits the super mask at a coarser resolution for the
    space-to-depth SR branch: the mask is constant over patch-size*s blocks
    (32 px), so as long as super_stride divides that block every s2d
    sub-position channel sees the same value and one (N, H/stride,
    W/stride, 1) plane broadcasts across all b*b*C channels.
    """
    n, L = mask.shape
    g = int(round(L ** 0.5))
    p = patch_size
    sp = patch_size * sr_scale
    assert sp % super_stride == 0, (sp, super_stride)
    mask2d = mask.reshape(n, g, g)
    pixel_mask = jnp.repeat(jnp.repeat(mask2d, p, axis=1), p, axis=2)

    idx = jnp.arange(g)
    col = column.reshape(n, 1)
    row_ = row.reshape(n, 1)
    in_rows = (idx[None, :] >= col) & (idx[None, :] < col + window)  # (N, g)
    in_cols = (idx[None, :] >= row_) & (idx[None, :] < row_ + window)
    super2d = (in_rows[:, :, None] & in_cols[:, None, :]).astype(mask.dtype)
    rep = sp // super_stride
    super_mask = jnp.repeat(jnp.repeat(super2d, rep, axis=1), rep, axis=2)
    return pixel_mask[..., None], super_mask[..., None]


def patchify(imgs: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """(N, H, W, C) -> (N, L, p*p*C), channel-last within a patch matching
    the reference's nchpwq->nhwpqc einsum (model_ecamp.py:138-150)."""
    n, h, w, c = imgs.shape
    p = patch_size
    gh, gw = h // p, w // p
    x = imgs.reshape(n, gh, p, gw, p, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(n, gh * gw, p * p * c)


def unpatchify(x: jnp.ndarray, patch_size: int, channels: int = 3) -> jnp.ndarray:
    """(N, L, p*p*C) -> (N, H, W, C) (reference model_ecamp.py:153-165)."""
    n, L, _ = x.shape
    p = patch_size
    g = int(round(L ** 0.5))
    x = x.reshape(n, g, g, p, p, channels)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(n, g * p, g * p, channels)
