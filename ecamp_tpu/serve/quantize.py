"""Weight-only int8 quantization for serving.

Small-batch inference on TPU is weight-read-bound: a ViT-B forward at
B=1 streams ~172 MB of bf16 parameters from HBM per request. Symmetric
per-output-channel int8 halves those bytes; the dequantization
(convert + broadcast-multiply) is an elementwise producer that XLA
fuses into the consuming dot/conv operand, so no dequantized copy of
the weights is ever materialized in HBM. Matmul outputs scale linearly
per output channel (y = (x @ q) * s when s is per-column), which is why
per-OUTPUT-channel scales lose no dot-product accuracy beyond the
rounding itself.

Beyond-reference subsystem (the reference serves nothing); wired as
`ecamp-serve --quantize int8` and usable with any engine's param tree.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _should_quantize(path: Tuple, leaf, min_elems: int) -> bool:
    """Quantize matmul/conv kernels above a size floor; leave biases,
    LayerNorm scales, embeddings and small heads in float."""
    name = str(getattr(path[-1], "key", path[-1])) if path else ""
    if name != "kernel":
        return False
    return leaf.ndim >= 2 and leaf.size >= min_elems


def quantize_params_int8(params, min_elems: int = 1 << 16):
    """-> {"weights": pytree (int8 where quantized, original elsewhere),
           "scales": {"/joined/path": (out_features,) float32}}.

    Symmetric per-output-channel (last axis) int8: q = round(w / s),
    s = max|w| / 127 over all non-last axes. Exactly-zero channels get
    scale 1 to avoid 0/0.
    """
    scales = {}

    def q(path, leaf):
        if not _should_quantize(path, leaf, min_elems):
            return leaf
        w = np.asarray(leaf, np.float32)
        red = tuple(range(w.ndim - 1))
        s = np.max(np.abs(w), axis=red) / 127.0
        s = np.where(s == 0, 1.0, s).astype(np.float32)
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        scales[key] = s
        return np.clip(np.rint(w / s), -127, 127).astype(np.int8)

    weights = jax.tree_util.tree_map_with_path(q, params)
    return {"weights": weights, "scales": scales}


def dequantize(qparams):
    """Inverse of quantize_params_int8, for use INSIDE a jitted apply:
    int8 leaves become float32 q * s. Traced: under jit the convert and
    multiply fuse into each consumer's operand, so quantized weights are
    read from HBM as int8."""
    scales = qparams["scales"]

    def dq(path, leaf):
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        if key in scales:
            return leaf.astype(jnp.float32) * scales[key]
        return leaf

    return jax.tree_util.tree_map_with_path(dq, qparams["weights"])


def wrap_apply_fn(apply_fn):
    """Lift apply_fn(params, x) to qapply(qparams, x). The scales ride
    in the pytree, so the engine's replicate/device_put handles them."""

    def qapply(qparams, x):
        return apply_fn(dequantize(qparams), x)

    return qapply


def quantization_error(params, qparams) -> float:
    """Max relative per-tensor L2 error across quantized leaves — a
    cheap health metric (symmetric int8 on well-scaled kernels lands
    around 0.2-0.5%)."""
    deq = jax.tree_util.tree_map(np.asarray, dequantize(
        jax.tree_util.tree_map(jnp.asarray, qparams)))
    worst = 0.0
    flat_o = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_d = jax.tree_util.tree_flatten_with_path(deq)[0]
    keys = set(qparams["scales"])
    for (po, o), (pd, d) in zip(flat_o, flat_d):
        key = "/".join(str(getattr(k, "key", k)) for k in po)
        if key not in keys:
            continue
        o = np.asarray(o, np.float32)
        err = float(np.linalg.norm(o - d) / max(np.linalg.norm(o), 1e-12))
        worst = max(worst, err)
    return worst
