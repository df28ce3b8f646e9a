"""Space-to-depth reformulation of the super-resolution conv stack.

The reference SR head (model_ecamp.py:28-46) runs two 3x3 convs with
C=3 over the 448^2 grid. On TPU a 3-channel conv wastes the 128-lane
minor dimension no matter the layout (measured: conv bwd at ~189 GB/s,
4x off the HBM roofline). A stride-1 zero-padded 3x3 conv on the fine
grid is EXACTLY a 3x3 zero-padded conv on a b-times-coarser grid whose
channels are the b*b sub-positions x C ("space-to-depth"): each output
sub-position (oy, ox) reads fine rows oy+dy, dy in {-1,0,1}, which land
in coarse blocks (oy+dy)//b in {-1,0,1} at sub-row (oy+dy)%b. With b=4
the same arithmetic runs at 112^2 x 48 channels — identical HBM bytes,
~5x better lane packing — and the structured coarse kernel is built
from the stock (3,3,3,3) parameters by a static scatter, so the param
tree and torch import are untouched.

Equality vs the direct formulation is tested in
tests/test_layout_variants.py; the end-to-end A/B lives in DESIGN.md.
"""

from __future__ import annotations

import functools

import numpy as np

import jax.numpy as jnp
from jax import lax


def space_to_depth(x: jnp.ndarray, b: int) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H/b, W/b, b*b*C), channel layout (py, px, c)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // b, b, w // b, b, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // b, w // b, b * b * c)


def depth_to_space(x: jnp.ndarray, b: int) -> jnp.ndarray:
    """Inverse of space_to_depth."""
    n, hc, wc, cc = x.shape
    c = cc // (b * b)
    x = x.reshape(n, hc, wc, b, b, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, hc * b, wc * b, c)


def fine3x3_to_coarse(w: jnp.ndarray, b: int) -> jnp.ndarray:
    """Transform a (3, 3, ci, co) SAME/zero-pad fine-grid kernel into the
    equivalent (3, 3, b*b*ci, b*b*co) coarse-grid kernel.

    Every (oy, ox, dy, dx) quadruple maps to a distinct
    (ky, kx, in-channel) slot for its column, so a scatter-set (no
    accumulation) builds the kernel; indices are static numpy, only the
    9*ci*co weight values are traced.
    """
    ci, co = int(w.shape[2]), int(w.shape[3])
    ky_i, kx_i, cin_i, cout_i = [], [], [], []
    dy_i, dx_i, ci_i, co_i = [], [], [], []
    for oy in range(b):
        for ox in range(b):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    fy, fx = oy + dy, ox + dx
                    for c_in in range(ci):
                        for c_out in range(co):
                            ky_i.append(fy // b + 1)
                            kx_i.append(fx // b + 1)
                            cin_i.append(((fy % b) * b + (fx % b)) * ci
                                         + c_in)
                            cout_i.append((oy * b + ox) * co + c_out)
                            dy_i.append(dy + 1)
                            dx_i.append(dx + 1)
                            ci_i.append(c_in)
                            co_i.append(c_out)
    idx = tuple(np.asarray(a) for a in (ky_i, kx_i, cin_i, cout_i))
    src = tuple(np.asarray(a) for a in (dy_i, dx_i, ci_i, co_i))
    coarse = jnp.zeros((3, 3, b * b * ci, b * b * co), w.dtype)
    return coarse.at[idx].set(w[src])


def coarse_bias(bias: jnp.ndarray, b: int) -> jnp.ndarray:
    """(co,) -> (b*b*co,): channel (oy, ox, c) keeps bias[c]."""
    return jnp.tile(bias, b * b)


@functools.lru_cache(maxsize=None)
def _up2_s2d_kernel(c: int) -> np.ndarray:
    """(4, 4, c, 16*c) stride-2 conv kernel computing 2x bilinear upsample
    (align_corners=False, same taps as ops.image_ops.resize_bilinear)
    fused with space_to_depth(b=4), for edge-padded VALID convolution.

    Fine output row i = 4*yc + py reads input rows 2*yc + {-1..2} with
    2-tap weights that depend only on py (the half-pixel grid src =
    i/2 - 0.25 never crosses a sample at the b=4 / scale=2 commensurate
    stride), so one 4x4 stride-2 kernel reproduces the whole map; border
    clamping is exactly edge padding by 1. The per-py taps are extracted
    from the resize weight matrix itself (an interior row block) so the
    two formulations cannot drift.
    """
    from .image_ops import _resize_matrix

    m = np.asarray(_resize_matrix(8, 16, "bilinear"), np.float64)
    # interior block yc=1: fine rows 4..7, taps at input rows 1..4
    wy = m[4:8, 1:5]
    k = np.zeros((4, 4, c, 16 * c), np.float32)
    for py in range(4):
        for px in range(4):
            tap = np.outer(wy[py], wy[px]).astype(np.float32)
            for ci in range(c):
                k[:, :, ci, (py * 4 + px) * c + ci] = tap
    return k


def upsample2x_s2d(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H/2, W/2, 16*C): bilinear 2x upsample emitted
    directly in space-to-depth(b=4) layout. Exactly equals
    space_to_depth(resize_bilinear(x, (2H, 2W)), 4) with NO transpose of
    the fine grid (the ~0.5 ms/step full-image layout copy the profile
    flagged), and its VJP is a transposed conv straight back to (H, W)."""
    c = int(x.shape[-1])
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    k = jnp.asarray(_up2_s2d_kernel(c), x.dtype)
    return lax.conv_general_dilated(
        xp, k, window_strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _conv_same(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _conv_stack_on_s2d(us: jnp.ndarray, w1, b1, w2, b2,
                       b: int) -> jnp.ndarray:
    """conv1 -> relu -> conv2 -> +residual -> relu (model_ecamp.py:37-46)
    on an already-space-to-depth input, with the coarse-transformed
    kernels. The single body behind sr_head_s2d and sr_conv_stack_s2d so
    the tested and the production path cannot diverge."""
    cw1 = fine3x3_to_coarse(w1, b)
    cw2 = fine3x3_to_coarse(w2, b)
    h = _conv_same(us, cw1) + coarse_bias(b1, b).astype(us.dtype)
    h = jnp.maximum(h, 0)
    h = _conv_same(h, cw2) + coarse_bias(b2, b).astype(us.dtype)
    return jnp.maximum(h + us, 0)


def sr_head_s2d(x: jnp.ndarray, w1, b1, w2, b2) -> jnp.ndarray:
    """Full SR head (model_ecamp.py:37-46) on the space-to-depth grid:
    fused upsample->s2d, then the conv stack. In: (N, H, W, C) at the
    encoder resolution; out: (N, H/2, W/2, 16*C) — s2d(b=4) of the 2x
    fine grid."""
    return _conv_stack_on_s2d(upsample2x_s2d(x), w1, b1, w2, b2, 4)


def sr_conv_stack_s2d(u: jnp.ndarray, w1, b1, w2, b2,
                      b: int = 4) -> jnp.ndarray:
    """The SR conv stack taking the bilinear-upsampled image u on the
    (N, H, W, C) NHWC fine grid. Returns the result STILL in s2d layout
    (N, H/b, W/b, b*b*C) — the res-loss (full-tensor mean of squares) is
    permutation-invariant, so callers compare against
    space_to_depth(target) and never pay the inverse transform."""
    return _conv_stack_on_s2d(space_to_depth(u, b), w1, b1, w2, b2, b)
