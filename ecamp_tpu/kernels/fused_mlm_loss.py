"""Fused vocab-projection + weighted cross-entropy (Pallas TPU).

The ECAMP MLM head ends in hidden(N=B*256, 768) @ W(768, 30000) followed by
a per-token weighted CE (bert_modeling.py:209-217). Materializing the
logits costs ~1 GB (bf16) of HBM per batch plus the fp32 softmax stream in
backward. This op streams vocabulary blocks through VMEM with an online
(max, sumexp, gold) reduction — logits never reach HBM — and a custom VJP
whose two backward kernels recompute logit tiles blockwise:

  fwd      grid (rows, vocab):  online logsumexp + gold gather
  bwd dx   grid (rows, vocab):  dl = (softmax - onehot)*w; dx += dl @ W^T
  bwd dW   grid (vocab, rows):  dW += x^T @ dl; db += colsum(dl)

Returns sum(w_i * ce_i); callers divide by N for the reference's mean
semantics. XLA fallback used on CPU.
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

BLOCK_N = 1024
BLOCK_V = 512
_NEG = -1e30


def _pad_to(x, n, axis, value=0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


# ---------------------------------------------------------------------------
# forward


def _fwd_kernel(v_actual, x_ref, w_ref, b_ref, lab_ref,
                lse_ref, gold_ref, m_ref, s_ref, g_ref):
    j = pl.program_id(1)
    nv = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        s_ref[:] = jnp.zeros_like(s_ref)
        g_ref[:] = jnp.zeros_like(g_ref)

    x = x_ref[:]  # (BN, D) bf16
    w = w_ref[:]  # (D, BV) bf16
    logits = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    logits = logits + b_ref[:].astype(jnp.float32)
    col0 = j * logits.shape[1]
    col = col0 + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col < v_actual, logits, _NEG)

    lm = jnp.max(logits, axis=-1, keepdims=True)
    m_old = m_ref[:]
    m_new = jnp.maximum(m_old, lm)
    s_ref[:] = s_ref[:] * jnp.exp(m_old - m_new) + \
        jnp.sum(jnp.exp(logits - m_new), axis=-1, keepdims=True)
    m_ref[:] = m_new
    onehot = (col == lab_ref[:]).astype(jnp.float32)
    g_ref[:] = g_ref[:] + jnp.sum(logits * onehot, axis=-1, keepdims=True)

    @pl.when(j == nv - 1)
    def _done():
        lse_ref[:] = m_ref[:] + jnp.log(s_ref[:])
        gold_ref[:] = g_ref[:]


@functools.partial(jax.jit, static_argnames=())
def _fused_fwd(x, w, b, labels):
    n, d = x.shape
    v = w.shape[1]
    n_pad = ((n + BLOCK_N - 1) // BLOCK_N) * BLOCK_N
    v_pad = ((v + BLOCK_V - 1) // BLOCK_V) * BLOCK_V
    xp = _pad_to(x, n_pad, 0)
    wp = _pad_to(w, v_pad, 1)
    bp = _pad_to(b.astype(jnp.float32), v_pad, 0)[None, :]
    lab = _pad_to(labels.astype(jnp.int32), n_pad, 0, value=-1)[:, None]

    grid = (n_pad // BLOCK_N, v_pad // BLOCK_V)
    lse, gold = pl.pallas_call(
        functools.partial(_fwd_kernel, v),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_N, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, BLOCK_V), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_V), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_N, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK_N, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_N, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BLOCK_N, 1), jnp.float32),
            pltpu.VMEM((BLOCK_N, 1), jnp.float32),
            pltpu.VMEM((BLOCK_N, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * d * v_pad,
            bytes_accessed=(xp.size + wp.size) * 2 + n_pad * 8,
            transcendentals=n_pad * v_pad,
        ),
    )(xp, wp, bp, lab)
    return lse[:n, 0], gold[:n, 0]


# ---------------------------------------------------------------------------
# backward kernels


def _bwd_dx_kernel(v_actual, x_ref, w_ref, b_ref, lab_ref, lse_ref, wg_ref,
                   dx_ref, acc_ref):
    j = pl.program_id(1)
    nv = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    logits = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b_ref[:].astype(jnp.float32)
    col0 = j * logits.shape[1]
    col = col0 + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    p = jnp.where(col < v_actual, jnp.exp(logits - lse_ref[:]), 0.0)
    onehot = (col == lab_ref[:]).astype(jnp.float32)
    dl = ((p - onehot) * wg_ref[:]).astype(x_ref.dtype)
    acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
        dl, w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == nv - 1)
    def _done():
        dx_ref[:] = acc_ref[:].astype(dx_ref.dtype)


def _bwd_dw_kernel(v_actual, x_ref, w_ref, b_ref, lab_ref, lse_ref, wg_ref,
                   dw_ref, db_ref, dw_acc, db_acc):
    i = pl.program_id(1)
    ni = pl.num_programs(1)
    j = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dw_acc[:] = jnp.zeros_like(dw_acc)
        db_acc[:] = jnp.zeros_like(db_acc)

    logits = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b_ref[:].astype(jnp.float32)
    col0 = j * logits.shape[1]
    col = col0 + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    p = jnp.where(col < v_actual, jnp.exp(logits - lse_ref[:]), 0.0)
    onehot = (col == lab_ref[:]).astype(jnp.float32)
    dl = (p - onehot) * wg_ref[:]
    dlc = dl.astype(x_ref.dtype)
    dw_acc[:] = dw_acc[:] + jax.lax.dot_general(
        x_ref[:], dlc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_acc[:] = db_acc[:] + jnp.sum(dl, axis=0, keepdims=True)

    @pl.when(i == ni - 1)
    def _done():
        dw_ref[:] = dw_acc[:].astype(dw_ref.dtype)
        db_ref[:] = db_acc[:].astype(db_ref.dtype)


def _fused_bwd_impl(x, w, b, labels, lse, wg):
    n, d = x.shape
    v = w.shape[1]
    n_pad = ((n + BLOCK_N - 1) // BLOCK_N) * BLOCK_N
    v_pad = ((v + BLOCK_V - 1) // BLOCK_V) * BLOCK_V
    xp = _pad_to(x, n_pad, 0)
    wp = _pad_to(w, v_pad, 1)
    bp = _pad_to(b.astype(jnp.float32), v_pad, 0)[None, :]
    lab = _pad_to(labels.astype(jnp.int32), n_pad, 0, value=-1)[:, None]
    # padded rows: lse=0 would make p=exp(logits) explode; set wg=0 rows
    lsep = _pad_to(lse[:, None], n_pad, 0, value=0.0)
    wgp = _pad_to(wg[:, None], n_pad, 0, value=0.0)

    grid_dx = (n_pad // BLOCK_N, v_pad // BLOCK_V)
    dx = pl.pallas_call(
        functools.partial(_bwd_dx_kernel, v),
        grid=grid_dx,
        in_specs=[
            pl.BlockSpec((BLOCK_N, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, BLOCK_V), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_V), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_N, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_N, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_N, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_N, d), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((BLOCK_N, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * n_pad * d * v_pad,
            bytes_accessed=(xp.size + wp.size) * 2,
            transcendentals=n_pad * v_pad),
    )(xp, wp, bp, lab, lsep, wgp)

    grid_dw = (v_pad // BLOCK_V, n_pad // BLOCK_N)
    dw, db = pl.pallas_call(
        functools.partial(_bwd_dw_kernel, v),
        grid=grid_dw,
        in_specs=[
            pl.BlockSpec((BLOCK_N, d), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, BLOCK_V), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_V), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_N, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_N, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_N, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((d, BLOCK_V), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_V), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, v_pad), w.dtype),
            jax.ShapeDtypeStruct((1, v_pad), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((d, BLOCK_V), jnp.float32),
                        pltpu.VMEM((1, BLOCK_V), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * n_pad * d * v_pad,
            bytes_accessed=(xp.size + wp.size) * 2,
            transcendentals=n_pad * v_pad),
    )(xp, wp, bp, lab, lsep, wgp)
    return dx[:n], dw[:, :v], db[0, :v]


# ---------------------------------------------------------------------------
# public op with custom VJP


def _xla_reference(x, w, b, labels, weights):
    logits = (x.astype(jnp.float32) @ w.astype(jnp.float32)
              + b.astype(jnp.float32))
    lse = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return jnp.sum((lse - gold) * weights.astype(jnp.float32))


@jax.custom_vjp
def fused_mlm_loss_sum(x, w, b, labels, weights):
    """sum_i weights_i * CE_i with the vocab projection fused in.
    x: (N, D), w: (D, V), b: (V,), labels/weights: (N,)."""
    lse, gold = _fused_fwd(x, w, b, labels)
    return jnp.sum((lse - gold) * weights.astype(jnp.float32))


def _vjp_fwd(x, w, b, labels, weights):
    lse, gold = _fused_fwd(x, w, b, labels)
    loss = jnp.sum((lse - gold) * weights.astype(jnp.float32))
    return loss, (x, w, b, labels, weights, lse)


def _vjp_bwd(res, g):
    x, w, b, labels, weights, lse = res
    wg = g * weights.astype(jnp.float32)
    dx, dw, db = _fused_bwd_impl(x, w, b, labels, lse, wg)
    return dx, dw, db.astype(b.dtype), None, None


fused_mlm_loss_sum.defvjp(_vjp_fwd, _vjp_bwd)


def fused_supported() -> bool:
    """Opt-in (ECAMP_FUSED_CE=1). Measured on v5e at the ECAMP pretrain
    shape (N=16384, D=768, V=30000, bf16): fused fwd+bwd 24.8 ms vs XLA's
    materialized path 20.1 ms — the two blockwise logit recomputes in
    backward cost more than the ~2 GB of saved HBM traffic at this size.
    The kernel's value is peak-memory: it removes the logits buffer
    entirely, which matters for larger batches / longer sequences."""
    import os

    return (pltpu is not None and jax.default_backend() == "tpu"
            and os.environ.get("ECAMP_FUSED_CE") == "1")
