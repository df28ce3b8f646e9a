"""Pallas fused LayerNorm (TPU) with XLA fallback.

One VMEM pass computes mean/var (fp32) and applies scale/shift, replacing
the reference's cuDNN LayerNorm (torch nn.LayerNorm used across timm blocks
and HF BERT). Rows are tiled over a 1-D grid; feature dim stays whole
(ECAMP feature dims: 512/768/1536/3072 — all lane-friendly).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

_ROW_BLOCK = 256


def _ln_reference(x, weight, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _ln_kernel(eps, x_ref, w_ref, b_ref, o_ref):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    o_ref[:] = (y * w_ref[:].astype(jnp.float32)
                + b_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps",))
def _ln_pallas(x, weight, bias, eps):
    orig_shape = x.shape
    d = orig_shape[-1]
    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    x2 = x.reshape(rows, d)
    block = min(_ROW_BLOCK, rows)
    pad_rows = ((rows + block - 1) // block) * block
    if pad_rows != rows:
        x2 = jnp.pad(x2, ((0, pad_rows - rows), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps),
        grid=(pad_rows // block,),
        in_specs=[
            pl.BlockSpec((block, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pad_rows, d), x.dtype),
    )(x2, weight, bias)
    return out[:rows].reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ln_ad(x, weight, bias, eps):
    return _ln_pallas(x, weight, bias, eps)


def _ln_fwd(x, weight, bias, eps):
    return _ln_pallas(x, weight, bias, eps), (x, weight, bias)


def _ln_bwd(eps, res, g):
    x, weight, bias = res
    _, vjp = jax.vjp(lambda x_, w_, b_: _ln_reference(x_, w_, b_, eps),
                     x, weight, bias)
    return vjp(g)


_ln_ad.defvjp(_ln_fwd, _ln_bwd)


def fused_layer_norm(x, weight, bias, eps: float = 1e-6,
                     use_pallas: Optional[bool] = None):
    """LayerNorm over the last axis. weight/bias: (d,)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and pltpu is not None
    if use_pallas:
        return _ln_ad(x, weight, bias, float(eps))
    return _ln_reference(x, weight, bias, eps)
