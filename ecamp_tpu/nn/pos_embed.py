"""Fixed 2-D sine-cosine position embeddings.

Numerically matches the reference generator (ECAMP/Pre-training/util/
pos_embed.py:20-67) including its idiosyncratic frequency scale
``omega = arange(d/2) / d / 2`` (i.e. omega/(2d), which differs from the
original MAE's omega*2/d) and its xy-meshgrid axis labelling — both must be
reproduced bit-for-bit for activation parity with reference checkpoints.
"""

from __future__ import annotations

import numpy as np


def _1d_sincos(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega = omega / embed_dim / 2.0
    omega = 1.0 / 10000 ** omega  # (D/2,)
    pos = pos.reshape(-1)
    out = np.einsum("m,d->md", pos, omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int,
                            cls_token: bool = False) -> np.ndarray:
    """Returns (grid_size**2 [+1], embed_dim) float32."""
    assert embed_dim % 2 == 0
    grid_h = np.arange(grid_size, dtype=np.float64)
    grid_w = np.arange(grid_size, dtype=np.float64)
    grid = np.meshgrid(grid_w, grid_h)  # xy indexing, w first (reference :28)
    grid = np.stack(grid, axis=0).reshape([2, 1, grid_size, grid_size])
    emb_h = _1d_sincos(embed_dim // 2, grid[0])
    emb_w = _1d_sincos(embed_dim // 2, grid[1])
    pos = np.concatenate([emb_h, emb_w], axis=1)
    if cls_token:
        pos = np.concatenate([np.zeros([1, embed_dim]), pos], axis=0)
    return pos.astype(np.float32)


def interpolate_pos_embed(pos_embed: np.ndarray, new_grid: int,
                          num_extra_tokens: int = 1) -> np.ndarray:
    """Bicubic resize of the patch-token part of a (1, N+extra, D) pos embed
    to a new grid resolution (reference util/pos_embed.py:75-96, which uses
    torch F.interpolate bicubic — a=-0.75, NOT jax.image.resize's a=-0.5
    Keys kernel; ops.image_ops carries the torch-kernel matrices)."""
    import jax.numpy as jnp

    from ..ops.image_ops import resize_bicubic

    pos_embed = np.asarray(pos_embed)
    squeeze = pos_embed.ndim == 2
    if squeeze:
        pos_embed = pos_embed[None]
    d = pos_embed.shape[-1]
    extra = pos_embed[:, :num_extra_tokens]
    patch = pos_embed[:, num_extra_tokens:]
    orig = int(round(patch.shape[1] ** 0.5))
    if orig == new_grid:
        return pos_embed[0] if squeeze else pos_embed
    grid = patch.reshape(1, orig, orig, d)
    resized = resize_bicubic(jnp.asarray(grid, jnp.float32),
                             (new_grid, new_grid))
    out = np.concatenate(
        [extra, np.asarray(resized).reshape(1, new_grid * new_grid, d)], axis=1)
    return out[0] if squeeze else out
