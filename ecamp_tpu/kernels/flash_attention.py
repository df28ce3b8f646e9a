"""Pallas TPU fused attention.

ECAMP's attention shapes are short-sequence, many-instance:
  ViT-B encoder        N=50 (masked MAE) / 197 / 785, D=64, B*H up to 3072
  MAE decoder          N=197, D=32, H=16
  BERT self-attention  N=256, D=128, H=6
  text->image cross    Nq=256, Nkv=49/196, D=128

At these sizes the whole (Nq, Nkv) logits tile fits in VMEM, so the optimal
TPU kernel is one fused softmax-attention per (batch*head) grid step: QK^T,
masked softmax (fp32), PV — with zero HBM traffic for logits. Long-sequence
flash blocking would only add loop overhead here.

Padding: callers may pass any N; we pad to sublane multiples and mask padded
keys with -inf via a static iota comparison (shapes are static under jit).

Replaces the cuDNN attention used by the reference via timm/HF
(timm Block.attn; transformers BertSelfAttention).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU too; kernels only run via interpret there
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

_LANE = 128
_MAX_FUSED_KV = 4096  # beyond this, fall back to XLA
# Measured on v5e (full ECAMP step, B=64): XLA's batched attention beats the
# per-(batch*head) fused kernel at ECAMP's short sequences (463 vs 413
# img/s) — each grid instance is a ~50x64 matmul, pure dispatch overhead.
# The kernel pays off once the per-instance logits tile is MXU-sized, so
# gate on Nq*Nk work. ECAMP_FLASH=1 forces it on for experiments.
_MIN_FUSED_WORK = 512 * 512


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def flash_supported(q, k, v, bias) -> bool:
    if pltpu is None:
        return False
    if q.ndim != 4 or k.ndim != 4 or v.ndim != 4:
        return False
    nq, nk = q.shape[-2], k.shape[-2]
    if nk > _MAX_FUSED_KV:
        return False
    import os

    min_work = int(os.environ.get("ECAMP_FLASH_MIN_WORK", _MIN_FUSED_WORK))
    if nq * nk < min_work and os.environ.get("ECAMP_FLASH") != "1":
        return False
    if bias is not None:
        # supported bias layouts: (B, 1, 1, Nk) key-padding bias or full
        if bias.ndim != 4:
            return False
    return True


def _attn_kernel(nk_actual: int, scale: float, has_bias: bool, *refs):
    if has_bias:
        q_ref, k_ref, v_ref, b_ref, o_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref = refs
    # Matmuls stay in the input dtype (bf16 is a native single MXU pass);
    # Precision.HIGHEST makes fp32 inputs exact (default fp32 dot on the MXU
    # truncates to bf16 passes — measured 7e-3 max err vs fp64 without it).
    # Mosaic rejects HIGHEST for bf16 operands, so pick per dtype.
    # Accumulation is always fp32 via preferred_element_type.
    q = q_ref[0]  # (Nq, D)
    k = k_ref[0]  # (Nk, D)
    v = v_ref[0]
    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=prec,
    ) * scale  # (Nq, Nk), fp32
    if has_bias:
        logits = logits + b_ref[0].astype(jnp.float32)
    # mask out padded keys (static shapes; nk_actual is a Python int)
    nk_pad = logits.shape[-1]
    if nk_pad != nk_actual:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < nk_actual, logits, -jnp.inf)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ) / denom
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale",))
def _flash_attention_impl(q, k, v, bias, scale):
    b, h, nq, d = q.shape
    nk = k.shape[2]
    nq_pad = _round_up(nq, 8)
    nk_pad = _round_up(nk, 8)

    def pad(x, n_to):
        n = x.shape[2]
        if n == n_to:
            return x
        return jnp.pad(x, ((0, 0), (0, 0), (0, n_to - n), (0, 0)))

    qp = pad(q, nq_pad).reshape(b * h, nq_pad, d)
    kp = pad(k, nk_pad).reshape(b * h, nk_pad, d)
    vp = pad(v, nk_pad).reshape(b * h, nk_pad, d)

    has_bias = bias is not None
    inputs = [qp, kp, vp]
    in_specs = [
        pl.BlockSpec((1, nq_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nk_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nk_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    if has_bias:
        bias4 = jnp.broadcast_to(bias, (b, h, nq, nk)).astype(jnp.float32)
        bias4 = jnp.pad(bias4, ((0, 0), (0, 0), (0, nq_pad - nq), (0, nk_pad - nk)))
        inputs.append(bias4.reshape(b * h, nq_pad, nk_pad))
        in_specs.append(
            pl.BlockSpec((1, nq_pad, nk_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM))

    kernel = functools.partial(_attn_kernel, nk, scale, has_bias)
    out = pl.pallas_call(
        kernel,
        grid=(b * h,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, nq_pad, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, nq_pad, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * nq_pad * nk_pad * d,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=b * h * nq_pad * nk_pad,
        ),
    )(*inputs)
    return out.reshape(b, h, nq_pad, d)[:, :, :nq, :]


def _xla_reference(q, k, v, bias, scale):
    # mirrors attention.py::_xla_attention (which imports from this module,
    # so it cannot be reused here): fp32 inputs need Precision.HIGHEST —
    # the Pallas forward is engineered for ~1e-6 fp32 accuracy and the
    # recompute-based backward must match, not fall back to bf16 passes
    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32,
                        precision=prec) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), v,
                      preferred_element_type=jnp.float32,
                      precision=prec).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_attention_ad(q, k, v, bias, scale):
    return _flash_attention_impl(q, k, v, bias, scale)


def _flash_fwd(q, k, v, bias, scale):
    return _flash_attention_impl(q, k, v, bias, scale), (q, k, v, bias)


def _flash_bwd(scale, res, g):
    # Backward via XLA recompute: at ECAMP sequence lengths the logits tile is
    # small, so rematerializing probs costs less than staging a second Pallas
    # kernel would save. Revisit if sequence lengths ever grow.
    q, k, v, bias = res
    if bias is None:
        _, vjp = jax.vjp(lambda q_, k_, v_: _xla_reference(q_, k_, v_, None, scale),
                         q, k, v)
        dq, dk, dv = vjp(g)
        return dq, dk, dv, None
    _, vjp = jax.vjp(lambda q_, k_, v_, b_: _xla_reference(q_, k_, v_, b_, scale),
                     q, k, v, bias)
    return vjp(g)


_flash_attention_ad.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q, k, v, bias=None, scale: Optional[float] = None):
    """Fused attention. q,k,v: (B,H,N,D); bias additive, broadcastable.

    Differentiable: forward runs the Pallas kernel, backward recomputes
    through the XLA reference (custom_vjp).
    """
    d = q.shape[-1]
    scale = (d ** -0.5) if scale is None else scale
    return _flash_attention_ad(q, k, v, bias, float(scale))
