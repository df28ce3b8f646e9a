"""Gradient finiteness at saturation for every loss (the YOLO BCE NaN
showed saturated/masked paths need explicit coverage)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from ecamp_tpu.ops.losses import (dice_coefficient, focal_loss,
                                  masked_pixel_losses, mixed_loss,
                                  sigmoid_bce, weighted_mlm_loss)


def _finite_grad(f, x):
    g = jax.grad(f)(x)
    return bool(np.all(np.isfinite(np.asarray(g))))


@pytest.mark.parametrize("extreme", [0.0, 40.0, -40.0])
def test_seg_losses_grads_finite(extreme):
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(2, 8, 8)) + extreme, jnp.float32)
    target = jnp.asarray((rng.random((2, 8, 8)) > 0.5), jnp.float32)
    assert _finite_grad(lambda x: focal_loss(x, target), logits)
    assert _finite_grad(lambda x: dice_coefficient(x, target), logits)
    assert _finite_grad(lambda x: mixed_loss(x, target), logits)
    assert _finite_grad(lambda x: sigmoid_bce(x, target), logits)


def test_all_zero_target_mixed_loss_grad():
    logits = jnp.full((2, 8, 8), -40.0)
    target = jnp.zeros((2, 8, 8))
    # perfect empty prediction: dice -> (0+1)/(0+0+1)=1, log(1)=0
    assert np.isfinite(float(mixed_loss(logits, target)))
    assert _finite_grad(lambda x: mixed_loss(x, target), logits)


def test_mlm_loss_grad_finite_extreme_logits():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(2, 4, 50)) * 30, jnp.float32)
    labels = jnp.asarray(rng.integers(0, 50, (2, 4)), jnp.int32)
    weights = jnp.asarray(rng.random((2, 4)), jnp.float32)
    assert _finite_grad(
        lambda x: weighted_mlm_loss(x, labels, weights), logits)
    # bf16 logits path
    assert _finite_grad(
        lambda x: weighted_mlm_loss(x.astype(jnp.bfloat16), labels, weights),
        logits)


def test_pixel_losses_grad_finite():
    rng = np.random.default_rng(2)
    pred = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)
    imgs = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)
    sp = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    big = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    pm = jnp.ones((1, 32, 32, 1))
    sm = jnp.zeros((1, 64, 64, 1))  # fully-masked SR window edge case

    def f(p):
        mim, res = masked_pixel_losses(p, imgs, sp, big, pm, sm)
        return mim + res

    assert _finite_grad(f, pred)
