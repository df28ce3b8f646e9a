"""Fused vocab-projection + weighted-CE kernel: numerics vs the XLA
reference, fwd + all three gradients, ragged shapes (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from ecamp_tpu.kernels import fused_mlm_loss as F


@pytest.mark.parametrize("n,d,v", [(70, 64, 300), (128, 32, 257)])
def test_fused_mlm_loss_matches_reference(n, d, v, monkeypatch):
    monkeypatch.setattr(F, "BLOCK_N", 32)
    monkeypatch.setattr(F, "BLOCK_V", 128)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, d)) * 0.5, jnp.float32)
    w = jnp.asarray(rng.normal(size=(d, v)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.normal(size=(v,)) * 0.1, jnp.float32)
    labels = jnp.asarray(rng.integers(0, v, (n,)), jnp.int32)
    weights = jnp.asarray(rng.random((n,)), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        out = F.fused_mlm_loss_sum(x, w, b, labels, weights)
        grads = jax.grad(F.fused_mlm_loss_sum, argnums=(0, 1, 2))(
            x, w, b, labels, weights)
    ref = F._xla_reference(x, w, b, labels, weights)
    ref_grads = jax.grad(F._xla_reference, argnums=(0, 1, 2))(
        x, w, b, labels, weights)
    assert abs(float(out - ref)) / abs(float(ref)) < 1e-5
    for a, r in zip(grads, ref_grads):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)


def test_fused_matches_weighted_mlm_loss_semantics(monkeypatch):
    """sum/N of the fused op equals ops.losses.weighted_mlm_loss on the
    same logits (the reference's mean-over-B*L semantics)."""
    monkeypatch.setattr(F, "BLOCK_N", 32)
    monkeypatch.setattr(F, "BLOCK_V", 128)
    from ecamp_tpu.ops.losses import weighted_mlm_loss

    rng = np.random.default_rng(1)
    B, L, d, v = 2, 16, 32, 200
    x = jnp.asarray(rng.normal(size=(B, L, d)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(d, v)) * 0.2, jnp.float32)
    b = jnp.asarray(rng.normal(size=(v,)) * 0.1, jnp.float32)
    labels = jnp.asarray(rng.integers(0, v, (B, L)), jnp.int32)
    weights = jnp.asarray(rng.random((B, L)), jnp.float32)
    logits = x @ w + b
    ref = weighted_mlm_loss(logits, labels, weights)
    with pltpu.force_tpu_interpret_mode():
        fused = F.fused_mlm_loss_sum(
            x.reshape(B * L, d), w, b, labels.reshape(-1),
            weights.reshape(-1)) / (B * L)
    assert abs(float(fused - ref)) / abs(float(ref)) < 1e-5
