"""Pallas TPU kernel for the SR head's conv stack.

The reference SR head (model_ecamp.py:28-46) is two 3x3 convs on THREE
channels at 448x448. XLA lowers C=3 convs through im2col + lane-padded
matmuls with layout copies on every edge — measured 16.2 ms fwd+bwd at
B=96 on v5e for ~6 GFLOP of actual work (tools/bench_sr.py). This kernel
computes conv1 -> relu -> conv2 -> +residual -> relu in one VMEM-resident
pass per (image, row-tile): channels-first slabs with H,W on the
(sublane, lane) grid, each 3x3x3 conv unrolled into 81 scalar-weighted
shifted adds on the VPU, fp32 accumulation. Row tiles carry a 2-px halo
(cut outside the kernel, so BlockSpecs stay non-overlapping); conv1 is
evaluated on the +1 halo ring so conv2 needs no second padding pass, with
the ring zero-masked at true image borders (torch zero-pads conv2's
input).

I/O is channels-first (B, 3, H, W); the flax module does the NHWC
transposes at the boundary (cheap — the tensors are bf16 and contiguous).
Backward runs as XLA recompute through the reference formulation
(custom_vjp), same strategy as kernels/flash_attention.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

_TILE_ROWS = 64


def _sr_kernel(C: int, H: int, W: int, tile: int,
               xp_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    """One (image, row-tile): xp (1, 1, C, tile+4, W+4) bf16 (2-px halo,
    zeros outside the image); out (1, 1, C, tile, W)."""
    t = pl.program_id(1)
    row0 = t * tile  # global image row of this tile's first output row
    xp = xp_ref[0, 0]  # (C, tile+4, W+4)

    def w_at(ref, dy, dx, ci, co):
        return ref[((dy * 3 + dx) * C + ci) * C + co]

    # conv1 on the (tile+2, W+2) halo grid — local row r is global row
    # row0 - 1 + r — so conv2 needs no second padding pass...
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile + 2, W + 2), 0) + (row0 - 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile + 2, W + 2), 1) - 1
    interior = ((rows >= 0) & (rows <= H - 1) & (cols >= 0) & (cols <= W - 1))
    y1 = []
    for co in range(C):
        acc = jnp.full((tile + 2, W + 2), b1_ref[co], jnp.float32)
        for dy in range(3):
            for dx in range(3):
                for ci in range(C):
                    tap = xp[ci, dy:dy + tile + 2, dx:dx + W + 2]
                    acc = acc + w_at(w1_ref, dy, dx, ci, co) * \
                        tap.astype(jnp.float32)
        # ...but the ring at TRUE image borders must be zero, not the
        # conv1 value evaluated outside the image.
        y1.append(jnp.where(interior, jax.nn.relu(acc), 0.0))

    for co in range(C):
        acc = jnp.full((tile, W), b2_ref[co], jnp.float32)
        for dy in range(3):
            for dx in range(3):
                for ci in range(C):
                    tap = y1[ci][dy:dy + tile, dx:dx + W]
                    acc = acc + w_at(w2_ref, dy, dx, ci, co) * tap
        residual = xp[co, 2:2 + tile, 2:2 + W].astype(jnp.float32)
        o_ref[0, 0, co] = jax.nn.relu(acc + residual).astype(o_ref.dtype)


@jax.jit
def _sr_conv_stack_impl(x_chw, w1, b1, w2, b2):
    b, c, h, w = x_chw.shape
    tile = _TILE_ROWS if h % _TILE_ROWS == 0 else h
    n_tiles = h // tile
    xp = jnp.pad(x_chw, ((0, 0), (0, 0), (2, 2), (2, 2)))
    # overlapping row tiles with a 2-px halo, cut outside the kernel
    xt = jnp.stack([xp[:, :, t * tile:t * tile + tile + 4]
                    for t in range(n_tiles)], axis=1)  # (B,T,C,tile+4,W+4)
    wf1 = w1.astype(jnp.float32).reshape(-1)  # (3,3,C,C) HWIO -> flat
    wf2 = w2.astype(jnp.float32).reshape(-1)
    kernel = functools.partial(_sr_kernel, c, h, w, tile)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, c, tile + 4, w + 4),
                         lambda i, t: (i, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, c, tile, w),
                               lambda i, t: (i, t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles, c, tile, w), x_chw.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * c * c * 9 * h * w,
            bytes_accessed=2 * x_chw.size * x_chw.dtype.itemsize,
            transcendentals=0,
        ),
    )(xt, wf1, b1.astype(jnp.float32), wf2, b2.astype(jnp.float32))
    return out.transpose(0, 2, 1, 3, 4).reshape(b, c, h, w)


def _xla_reference(x_chw, w1, b1, w2, b2):
    """Reference formulation (NCHW lax convs) — correctness oracle and
    backward path."""
    dt = x_chw.dtype
    dn = ("NCHW", "HWIO", "NCHW")
    y = jax.lax.conv_general_dilated(
        x_chw, w1.astype(dt), (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)
    y = jax.nn.relu(y + b1.astype(dt)[None, :, None, None])
    y = jax.lax.conv_general_dilated(
        y, w2.astype(dt), (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)
    return jax.nn.relu(y + b2.astype(dt)[None, :, None, None] + x_chw)


@jax.custom_vjp
def _sr_conv_stack_ad(x_chw, w1, b1, w2, b2):
    return _sr_conv_stack_impl(x_chw, w1, b1, w2, b2)


def _sr_fwd(x_chw, w1, b1, w2, b2):
    return _sr_conv_stack_impl(x_chw, w1, b1, w2, b2), (x_chw, w1, b1, w2, b2)


def _sr_bwd(res, g):
    _, vjp = jax.vjp(_xla_reference, *res)
    return vjp(g)


_sr_conv_stack_ad.defvjp(_sr_fwd, _sr_bwd)


def sr_supported(x_chw) -> bool:
    """Opt-in only (ECAMP_SR_KERNEL=1). Measured on v5e at B=96: this
    kernel's fwd is 8.8 ms vs 7.8 ms for XLA's NCHW conv — the 81-tap VPU
    stencil pays a lane-rotate per dx-shifted tap and loses to XLA's
    im2col. Kept as the experiment baseline; the model uses the NCHW
    _xla_reference formulation (nn/mae.py::SuperResolutionHead)."""
    import os

    if os.environ.get("ECAMP_SR_KERNEL") != "1":
        return False
    if pltpu is None or jax.default_backend() != "tpu":
        return False
    b, c, h, w = x_chw.shape
    tile = _TILE_ROWS if h % _TILE_ROWS == 0 else h
    # fp32 working set per grid step (xp slab + C y1 slabs), lane-padded
    lanes = -(-(w + 4) // 128) * 128
    vmem = 2 * c * (tile + 4) * lanes * 4
    return c <= 4 and vmem < 8 * 2 ** 20


def sr_conv_stack(x_chw: jnp.ndarray, w1, b1, w2, b2) -> jnp.ndarray:
    """relu(conv2(relu(conv1(x))) + x), 3x3 convs, zero pad, channels-first.

    Differentiable: Pallas forward, XLA-recompute backward.
    """
    return _sr_conv_stack_ad(x_chw, w1, b1, w2, b2)
